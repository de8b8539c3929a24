"""S8: JDBC/OLTP source (reference README.md:72-139 — the PostgreSQL
"before" picture the lakehouse curriculum contrasts against).

The engine side is Spark's built-in JDBC datasource, wrapped so reads are
PARTITIONED by default: an un-partitioned JDBC read is one executor pulling
the whole table through one connection — the classic accidental bottleneck.
``read_jdbc`` requires the caller to think about (partitionColumn,
lowerBound, upperBound, numPartitions) the way ``spark.read.jdbc`` lets
them forget to.

There is no PostgreSQL server in this environment, so the registered query
exercises the exact same datasource code path against an EMBEDDED Apache
Derby database (the Derby jars ship inside the Spark distribution —
nothing external): seed Derby from the ``orders`` testdata through the
JDBC WRITER, read it back through the partitioned JDBC READER, aggregate.
A user pointing this at PostgreSQL swaps the URL and driver string only.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark.functions.numeric import dsum, o_dsum
from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC read: ``num_partitions`` concurrent connections,
    each scanning one stride of ``partition_column``. Predicates and column
    pruning still push into the remote SQL (Spark's JDBC relation builds
    WHERE/SELECT server-side)."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    if driver:
        r = r.option("driver", driver)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
) -> None:
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def _embedded_derby_url(spark: SparkSession) -> str:
    # keep Derby's boot log out of the repo cwd (read once at engine boot)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", "/tmp/derby.log"
    )
    db = os.path.join("/tmp", "tis_jdbc", uuid.uuid4().hex[:12], "db")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    return f"jdbc:derby:{db};create=true"


@register(
    "s8_jdbc_roundtrip",
    oracle=f"""
        SELECT o_orderstatus, COUNT(*) AS cnt,
               {o_dsum('o_totalprice', 'total_price')}
        FROM orders WHERE o_orderkey % 7 = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="S8 JDBC/OLTP source (README.md:72-139): seed an embedded Derby "
    "database through the JDBC writer, read it back through the JDBC "
    "READER with an 8-way partitioned scan (8 concurrent connections, "
    "one o_orderkey stride each — never one connection pulling the whole "
    "table), aggregate per status. Same datasource path as PostgreSQL; "
    "only the URL/driver strings differ",
    tags=("source", "jdbc"),
)
def s8_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = _embedded_derby_url(spark)
    sub = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    write_jdbc(sub, url, "orders_oltp", driver=DERBY_DRIVER)
    hi = sub.agg(F.max("o_orderkey")).first()[0]
    back = read_jdbc(
        spark,
        url,
        "orders_oltp",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=8,
        driver=DERBY_DRIVER,
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice", "total_price"))
        .orderBy("o_orderstatus")
    )
