"""Sinks + round-trip sources: SURVEY.md §2.1 S2-S6.

The reference exercises COPY-to-CSV (README.md:204), COPY-to-Parquet
(README.md:208) and partitioned COPY with year/month derivation
(README.md:389-398) followed by glob reads + partition-pruned reads
(README.md:404-421). Each round-trip below writes to a scratch dir and
reads back through Spark partition discovery, so the oracle can check the
*data* while pytest checks the *plan* (PartitionFilters pruning).

Scale note: partitionBy(year, month) is exactly the layout that lets a
1000-executor cluster prune 99% of a 100 TB table on a month predicate; the
writer also repartitions by the partition columns so each task writes one
file per partition instead of spraying small files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark import scratch as _scratch
from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.functions.numeric import dsum, o_dsum
from tutorial_iceberg_spark.registry import register


def scratch_dir(name: str) -> str:
    """Sink round-trip staging under the cluster-portable scratch root
    (TIS_SCRATCH_DIR on multi-node deploys — executors must see the same
    path the read-back scan resolves). Names are fixed PER DRIVER
    PROCESS (pid leaf, no uuid): repeated runs in one session overwrite
    their own dir and reuse space, while two concurrently-running
    drivers never overwrite each other's staging mid-read (caught by
    the r13 loaded-run protocol — two suite instances raced the same
    fixed path). The pid dirs live under the reaper's tis_ namespace,
    so abandoned ones age out by grace like any other scratch."""
    return os.path.join(
        _scratch.scratch_dir("tis_scratch", f"pid-{os.getpid()}"), name
    )


def write_csv(df: DataFrame, path: str) -> None:
    """S3 CSV sink — COPY ... (HEADER, DELIMITER ',') README.md:204."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str) -> None:
    """S4 Parquet sink — COPY ... (FORMAT PARQUET) README.md:208."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """S5 partitioned Parquet sink — README.md:389-398.

    Repartition on the partition columns first: one shuffle, but each
    output task then owns whole partitions -> no small-file explosion
    (the pre-compaction lesson of README.md:1016-1022).
    """
    df.repartition(*[F.col(c) for c in cols]).write.mode("overwrite").partitionBy(
        *cols
    ).parquet(path)


@register(
    "s3_csv_roundtrip",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS cnt,
               {o_dsum('value', 'sum_value')}
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="S3 CSV sink + read-back with explicit schema — README.md:204",
    tags=("sink",),
)
def s3_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = scratch_dir("csv_events")
    write_csv(events, path)
    back = spark.read.option("header", True).schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).csv(path)
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))
        .orderBy("event_type")
    )


@register(
    "s4_parquet_roundtrip",
    oracle=f"""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS cnt,
               {o_dsum('value', 'sum_value')}
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    doc="S4 Parquet sink + read-back — README.md:208; full fidelity incl. timestamps",
    tags=("sink",),
)
def s4_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("parquet_events")
    write_parquet(events, path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))
        .orderBy("day")
    )


@register(
    "s5_partitioned_roundtrip",
    oracle=f"""
        SELECT CAST(month(l_shipdate) AS INTEGER) AS month,
               COUNT(*) AS cnt,
               {o_dsum('l_extendedprice', 'sum_price')}
        FROM lineitem
        WHERE year(l_shipdate) = 1998
        GROUP BY 1
        ORDER BY 1
    """,
    doc="S5+S2+A8 partitioned write (year/month), partition-discovered glob read, "
    "pruned scan on year=1998 — README.md:389-421, 631-639",
    tags=("sink", "partition"),
)
def s5_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumns(
        {
            "year": F.year("l_shipdate"),
            "month": F.month("l_shipdate"),
        }
    )
    path = scratch_dir("part_lineitem")
    write_partitioned(li, path, "year", "month")
    back = spark.read.parquet(path)  # partition discovery: year=/month= dirs
    return (
        back.filter(F.col("year") == 1998)  # pruned at planning time
        .groupBy(F.col("month").cast("int").alias("month"))
        .agg(F.count("*").alias("cnt"), dsum("l_extendedprice", "sum_price"))
        .orderBy("month")
    )


@register(
    "s11_jsonl_roundtrip",
    oracle=f"""
        SELECT lang, source, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    doc="JSONL sink + source roundtrip (SURVEY §2.1 extension): documents "
    "written as newline-delimited JSON — the interchange format of every "
    "LLM training-data pipeline — and read back with an explicit schema "
    "(no sampling-based inference pass over 100 TB), then aggregated. "
    "Identity of the roundtrip is what the oracle checks: the aggregate "
    "over the read-back must equal the aggregate over the parquet original",
    tags=("sink", "source", "extension"),
)
def s11_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("jsonl_documents")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(path)
    return (
        back.groupBy("lang", "source")
        .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "source")
    )
