"""S9 Parquet metadata introspection: SURVEY.md §2.1 S9.

The reference teaches the Parquet physical layout by querying
``DESCRIBE SELECT * FROM '...parquet'`` and ``parquet_metadata(path)`` for
per-row-group num_values / stats_min / stats_max (README.md:313-337) —
that's the min/max-skipping story behind predicate pushdown
(README.md:293-296). Spark has no SQL builtin for footer stats, so the
engine exposes them via a small PyArrow helper surfaced as a DataFrame.

The helper reads ONLY file footers (no data pages) on the driver — the same
O(row-groups) planning-cost profile Iceberg manifests give, fine even for a
table of thousands of files if called per-file.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from tutorial_iceberg_spark.io import table_path
from tutorial_iceberg_spark.registry import register

ROWGROUP_SCHEMA = (
    "row_group_id bigint, path_in_schema string, num_values bigint, "
    "null_count bigint, total_compressed_size bigint"
)


def footer_row_count(sf_dir: str, table: str) -> int:
    """Exact table row count from parquet footers alone — no Spark job,
    no data scan. The cheap cardinality source the candidate-contract
    ``auto`` paths (cosine_edges, x_knn_classify_loo) gate on: a
    ``df.count()`` there launched a full distributed scan job on every
    invocation just to pick a strategy (ADVICE r6). Handles the
    single-file fixture layout, a flat multi-file directory, AND nested /
    Hive-partitioned layouts (recursive walk — a top-level-only listing
    silently returned 0 on partitioned tables, flipping the auto gate to
    an O(n^2) all-pairs plan with no error; ADVICE r7). Raises on a path
    with no parquet files rather than reporting an empty table; on a
    lakehouse table the equivalent is the manifest's row-count sum."""
    path = table_path(sf_dir, table)
    return sum(
        pq.ParquetFile(fp).metadata.num_rows for fp in _table_files(path)
    )


def _table_files(path: str) -> list[str]:
    """Concrete parquet file paths for a table path — a single file in
    the fixture layout, all parts of a flat or nested (Hive-partitioned)
    directory. Recurses so partition subdirectories contribute; raises
    if the walk finds no parquet files (a silent empty answer here
    mis-sizes every footer-gated planning decision)."""
    if os.path.isdir(path):
        files = [
            os.path.join(root, f)
            for root, _dirs, names in os.walk(path)
            for f in names
            if f.endswith(".parquet")
        ]
        if not files:
            raise FileNotFoundError(
                f"no parquet files under table directory {path!r}"
            )
        return sorted(files)
    return [path]


def rowgroup_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-(row group, column) footer statistics as a DataFrame.
    Directory tables contribute every part file; row_group_id is a
    running index across files (file order sorted, deterministic)."""
    rows = []
    rg_base = 0
    for fp in _table_files(path):
        md = pq.ParquetFile(fp).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                st = col.statistics
                rows.append(
                    (
                        rg_base + rg,
                        col.path_in_schema,
                        st.num_values if st is not None else None,
                        st.null_count
                        if st is not None and st.has_null_count
                        else None,
                        col.total_compressed_size,
                    )
                )
        rg_base += md.num_row_groups
    return spark.createDataFrame(rows, ROWGROUP_SCHEMA)


def describe_parquet(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE-style schema listing read from the Parquet footer
    (README.md:313-316)."""
    schema = pq.ParquetFile(_table_files(path)[0]).schema_arrow
    rows = [(f.name, str(f.type), f.nullable) for f in schema]
    return spark.createDataFrame(rows, "column_name string, column_type string, nullable boolean")


@register(
    "s9_rowgroup_stats",
    oracle="""
        SELECT 0 AS row_group_id,
               col AS path_in_schema,
               (SELECT COUNT(*) FROM lineitem) AS num_values
        FROM (VALUES ('l_orderkey'), ('l_partkey'), ('l_suppkey'),
                     ('l_linenumber'), ('l_quantity'), ('l_extendedprice'),
                     ('l_discount'), ('l_tax'), ('l_returnflag'),
                     ('l_linestatus'), ('l_shipdate')) t(col)
        ORDER BY row_group_id, path_in_schema
    """,
    doc="S9 parquet_metadata() row-group introspection — README.md:319-337. "
    "Oracle derives footer truth from the registered view, SF-agnostically: "
    "the testdata files are single-row-group, so each column's footer "
    "num_values equals the table count (a multi-row-group file would make "
    "the Spark side emit extra rows and fail the compare honestly).",
    tags=("metadata",),
)
def s9_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = rowgroup_stats(spark, table_path(sf_dir, "lineitem"))
    return df.select("row_group_id", "path_in_schema", "num_values").orderBy(
        "row_group_id", "path_in_schema"
    )
