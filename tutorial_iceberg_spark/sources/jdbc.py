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

LOCAL-MODE ASSUMPTION (ADVICE r5): the embedded ``jdbc:derby:<dir>`` form
boots the database inside whichever JVM opens it, and Derby allows exactly
ONE booting JVM per database directory. The 8-way partitioned read
therefore works here only because local-mode executors share the driver
JVM. On a real multi-JVM cluster this exact demo would fail to boot from
the executors — point the URL at a server-form database instead (Derby
network server ``jdbc:derby://host/db``, or PostgreSQL/MySQL/...); the
reader/writer wrappers themselves are cluster-correct, the embedded URL is
the demo fixture. Per-run scratch databases live under
``<TIS_SCRATCH_DIR or tmpdir>/tis_jdbc`` and stale ones are swept on the
next run.
"""

from __future__ import annotations

import os
import shutil
import time
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


_STALE_AFTER_SEC = 3600  # grace window: never sweep a possibly-live run


def _scratch_root() -> str:
    # Embedded-Derby demo databases under the cluster-portable scratch
    # root. Note the honest caveat: embedded Derby itself is a
    # single-node fixture (every executor JVM opens the db path via
    # JDBC); a real cluster points read_jdbc at an actual database URL,
    # at which point no scratch is involved.
    from tutorial_iceberg_spark import scratch as _scratch

    return _scratch.scratch_dir("tis_jdbc")


def _sweep_stale_scratch() -> None:
    """Remove scratch databases from finished runs (ADVICE r5: they were
    never cleaned up). Age-gated so a concurrent bench/test session's live
    database is never deleted; the new run's own directory is created
    after the sweep."""
    try:
        entries = os.listdir(_scratch_root())
    except FileNotFoundError:
        return
    cutoff = time.time() - _STALE_AFTER_SEC
    for name in entries:
        p = os.path.join(_scratch_root(), name)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass


def _embedded_derby_url(spark: SparkSession) -> str:
    # keep Derby's boot log out of the repo cwd (read once at engine boot)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", os.path.join(_scratch_root(), "derby.log")
    )
    _sweep_stale_scratch()
    db = os.path.join(_scratch_root(), uuid.uuid4().hex[:12], "db")
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
    "only the URL/driver strings differ. Embedded Derby admits one booting "
    "JVM, so the partitioned read of THIS DEMO FIXTURE requires local mode "
    "(executors sharing the driver JVM) — a server-form URL lifts that",
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
