"""Table IO: the engine's source layer over the driver's parquet testdata.

Covers SURVEY.md S1 (parquet scan), S2 (glob/partition discovery via
sources.sinks round-trips), and normalizes the one schema quirk in the
testdata: events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
natively. We read it as epoch-nanos LongType (legacy conf) and truncate to a
microsecond TIMESTAMP_NTZ — byte-identical to what DuckDB's reader produces
for the same file, so oracle comparisons are exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark.session import apply_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# A parquet file is split at row-group boundaries; below this size the
# testdata files are one row group = ONE scan task, which serializes every
# downstream map-side partial aggregation onto a single core.
_SMALL_FILE_BYTES = 64 * 1024 * 1024


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one testdata table as a DataFrame with normalized types.

    ``spread=True`` is the small-input parallelism floor: when the whole
    table is a single small parquet file (hence a single row group =
    single scan task), fan it out to the cluster's parallelism with a
    round-robin repartition — a few-MB shuffle that unserializes the
    downstream work. Opt-in because it only pays where the consumer does
    HEAVY per-row compute or map-side aggregation straight off the scan;
    a query whose next operator is a shuffle join/exchange already fans
    out there, and the extra pass is pure overhead. The condition checks
    the actual file layout, so at real scale (inputs with thousands of
    row groups) it no-ops and plans stay shuffle-free. Filters and column
    pruning still reach the scan: Catalyst pushes both through a
    Repartition node."""
    apply_engine_conf(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos -> truncate to us (matches DuckDB ns->us read) and keep
        # timezone-naive semantics: session tz is pinned to UTC so the
        # LTZ->NTZ cast is the identity on the wall-clock value.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if spread and os.path.isfile(path) and os.path.getsize(path) < _SMALL_FILE_BYTES:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register temp views so spark.sql() queries use the same bare table
    names as the DuckDB oracle (FIXTURES.md 'Oracle registration note')."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
