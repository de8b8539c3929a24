"""E1/E2 plan inspection + timing: SURVEY.md §2.10.

The reference's Week-3 exercise is EXPLAIN ANALYZE showing
PARQUET_SCAN -> FILTER -> HASH_GROUP_BY and confirming predicate pushdown
(README.md:654-703). The Spark equivalents are formatted explain output and
a scan summary extracting exactly the three things that matter at 100 TB:
PushedFilters (row-group skipping), ReadSchema (column pruning), and
PartitionFilters (partition pruning).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(...) as a string instead of stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def describe_select(spark: SparkSession, sql: str) -> DataFrame:
    """``DESCRIBE SELECT ...`` parity (README.md:313-316): the schema a
    query WOULD produce, resolved by the analyzer only — no job runs, no
    data is read beyond the parquet footer the scan node needs. Returns
    (column_name, column_type) rows using Spark's simpleString type names.
    """
    fields = spark.sql(sql).schema.fields  # analysis-only
    return spark.createDataFrame(
        [(f.name, f.dataType.simpleString()) for f in fields],
        "column_name string, column_type string",
    )


@register(
    "e1_describe_select",
    oracle="""
        SELECT column_name,
               CASE column_type
                   WHEN 'BIGINT' THEN 'bigint'
                   WHEN 'DOUBLE' THEN 'double'
                   WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
                   WHEN 'VARCHAR' THEN 'string'
                   ELSE lower(column_type) END AS column_type
        FROM (DESCRIBE SELECT l_orderkey, l_quantity,
                  l_extendedprice * (1 - l_discount) AS disc_price,
                  l_shipdate, l_returnflag
              FROM lineitem)
        ORDER BY column_name
    """,
    doc="E1 DESCRIBE SELECT parity (README.md:313-316 — schema of a query "
    "without running it): the analyzer resolves names, the computed "
    "column's type, and the parquet footer schema; the CASE in the oracle "
    "maps DuckDB's type names onto Spark simpleString names (the engine's "
    "documented load mapping: TIMESTAMP->timestamp_ntz, VARCHAR->string)",
    tags=("explain", "metadata"),
)
def e1_describe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("e1_li")
    return describe_select(
        spark,
        "SELECT l_orderkey, l_quantity, "
        "l_extendedprice * (1 - l_discount) AS disc_price, "
        "l_shipdate, l_returnflag FROM e1_li",
    ).orderBy("column_name")


@dataclass
class ScanSummary:
    pushed_filters: list[str]
    partition_filters: list[str]
    read_schema: str
    has_codegen: bool

    @property
    def prunes_columns(self) -> bool:
        return bool(self.read_schema)


def scan_summary(df: DataFrame) -> ScanSummary:
    plan = explain_str(df, "formatted")

    def grab(key: str) -> list[str]:
        out = []
        for line in plan.splitlines():
            if key in line:
                body = line.split(":", 1)[-1].strip().strip("[]")
                # split on commas that are OUTSIDE parentheses
                depth, cur = 0, ""
                for ch in body:
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    if ch == "," and depth == 0:
                        if cur.strip():
                            out.append(cur.strip())
                        cur = ""
                    else:
                        cur += ch
                if cur.strip():
                    out.append(cur.strip())
        return out

    read_schema = ""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m:
        read_schema = m.group(1)
    return ScanSummary(
        pushed_filters=grab("PushedFilters"),
        partition_filters=grab("PartitionFilters"),
        read_schema=read_schema,
        # simple mode marks codegen stages with "*(n)"; formatted names them
        has_codegen="WholeStageCodegen" in plan or "*(" in explain_str(df, "simple"),
    )


def bench(df: DataFrame, label: str = "") -> tuple[float, int]:
    """E2 timing harness (console.time analog, README.md:97-110): wall-clock
    a full materialization of the plan; returns (seconds, row_count)."""
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n
