"""Bucketed tables: co-located fact-to-fact joins without a shuffle.

At 100 TB the orders |><| lineitem join (see q3_shipping_priority) shuffles
both facts on every query. Bucketing pays that shuffle ONCE at write time:
both tables are written with ``bucketBy(N, key)`` so matching keys land in
matching files, and every subsequent join on that key compiles to a
sort-merge join with NO Exchange on either side (pytest asserts exactly
that). This is the standard Spark answer to "repeated big joins on the same
key" — the other being Iceberg's bucket partition transform, which the
lakehouse layer's partition specs mirror.

The bucket count is fixed at table-creation time: size it to target
file/task sizes at the expected data volume (128-512 MB per bucket-file);
16 here only because the testdata is small.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark import scratch as _scratch
from tutorial_iceberg_spark.functions.numeric import dec
from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register

N_BUCKETS = 16


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = N_BUCKETS
) -> str:
    """Write df as a bucketed+sorted external table; returns the table name.
    Sorting within buckets lets the join skip its per-task sort too."""
    # Bucketed table files must be visible to every executor reading the
    # join -> cluster-portable scratch root (TIS_SCRATCH_DIR); the join
    # result reads these files, so removal rides the scratch reaper.
    path = os.path.join(
        _scratch.defer_cleanup(_scratch.scratch_dir("tis_buckets", unique=True)),
        table,
    )
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    return table


def bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """orders + lineitem bucketed on the join key, fresh names per call."""
    tag = uuid.uuid4().hex[:8]
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    t_orders = write_bucketed(orders, f"orders_b_{tag}", "o_orderkey")
    t_li = write_bucketed(lineitem, f"lineitem_b_{tag}", "l_orderkey")
    return t_orders, t_li


@register(
    "s10_bucketed_join",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
                            * CAST(1 - l_discount AS DECIMAL(15,8))), 2) AS DOUBLE)
                   AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Bucketed co-located join: both facts pre-bucketed on the order key "
    "so the sort-merge join runs with zero Exchange (shuffle paid once at "
    "write time, amortized over every subsequent join)",
    tags=("source", "join", "bucketing"),
)
def s10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_li = bucketed_pair(spark, sf_dir)
    orders = spark.table(t_orders)
    li = spark.table(t_li)
    rev = F.round(
        F.sum(dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(15,8)")),
        2,
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), rev.alias("revenue"))
        .orderBy("o_orderpriority")
    )
