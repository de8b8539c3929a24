"""S7 row generator: the reference's synthetic-events pattern, deterministic.

The reference generates its events table with generate_series + random()
(README.md:188-200). random() can't hash-match across engines, so the
engine derives pseudo-randoms from md5(i) — bit-identical in Spark and
DuckDB — keeping the exact generation *shape* (CASE over a mod-3 value,
amount scaling, base-timestamp + INTERVAL day offset, README.md:191-198)
while staying oracle-checkable. F.rand(seed) remains available for
engine-internal sampling (seeded, SURVEY §5.2).

Scale note: spark.range is a parallel, partitioned source — generating
10^9 rows distributes evenly across executors with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark.registry import register

N_ROWS = 10_000


def _h(col, salt: str):
    """32-bit uniform hash of (salt || i), identical in Spark and DuckDB:
    first 8 hex chars of md5, parsed base-16."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")


def _o_h(expr: str, salt: str) -> str:
    return f"CAST('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 8) AS BIGINT)"


def generate_events(spark: SparkSession, n_rows: int = N_ROWS) -> DataFrame:
    """Deterministic replica of README.md:188-200's events generator."""
    i = F.col("id")
    k = _h(i, "t") % 3
    return spark.range(1, n_rows + 1).select(
        i.alias("i"),
        (_h(i, "u") % 10000).cast("int").alias("user_id"),
        F.when(k == 0, "click").when(k == 1, "view").otherwise("purchase").alias("event_type"),
        ((_h(i, "a") % 100000) / 100.0).alias("amount"),
        F.expr(
            "timestampadd(DAY, CAST(conv(substring(md5(concat('d', cast(id as string))), 1, 8), 16, 10) AS BIGINT) % 365, TIMESTAMP_NTZ'2024-01-01 00:00:00')"
        ).alias("ts"),
    )


@register(
    "s7_generator_agg",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS cnt,
               CAST(ROUND(SUM(CAST(amount AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_amount,
               CAST(min(ts) AS TIMESTAMP) AS first_ts
        FROM (
            SELECT
                { _o_h('i', 'u') } % 10000 AS user_id,
                CASE { _o_h('i', 't') } % 3
                     WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                     ELSE 'purchase' END AS event_type,
                ({ _o_h('i', 'a') } % 100000) / 100.0 AS amount,
                TIMESTAMP '2024-01-01' + INTERVAL ({ _o_h('i', 'd') } % 365) DAY AS ts
            FROM generate_series(1, {N_ROWS}) t(i)
        ) g
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="S7 row generator (generate_series ≡ spark.range) + the reference's synthetic "
    "events shape, README.md:188-200 — deterministic md5-derived pseudo-randoms",
    tags=("generator",),
)
def s7_generator_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = generate_events(spark)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(F.col("amount").cast("decimal(15,4)")), 2)
            .cast("double")
            .alias("sum_amount"),
            F.min("ts").alias("first_ts"),
        )
        .orderBy("event_type")
    )
