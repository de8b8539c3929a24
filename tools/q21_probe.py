"""q21 variant shoot-out (r17 VERDICT item 1).

Three implementations of the same query, interleaved round-robin in ONE
Spark session with the noop sink (guide §1.4), so host drift cancels the
same way bench.py's paired phase cancels it:

  A: the r15 shape (ordstats as a broadcast build + l1 probe join-back —
     2 lineitem scans, numwait = COUNT(*) over qualifying R rows)
  B: the r16 shape (current code: single scan, two-level agg carrying
     n_ret_rows + ret_suppkey, TWO fact-sized exchanges)
  C: candidate  (single scan, ONE fact exchange: repartition on
     l_orderkey satisfies both groupBys — hash partitioning by a subset
     of the grouping keys — so the two agg levels pipeline in one stage)

Usage: python tools/q21_probe.py [--rounds=N] [--sf=DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tutorial_iceberg_spark.io import load_table  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def v_a(spark, sf_dir):  # r15 shape
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_ret")
    )
    ordstats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_ret").alias("n_ret_supp")
    )
    fin_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        l1.join(
            ordstats.filter(
                (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .join(fin_orders, l1.l_orderkey == fin_orders.o_orderkey, "left_semi")
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def v_b(spark, sf_dir):  # r16 shape (current registered code)
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret_rows")
    )
    ordstats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("ret_rows") > 0).cast("int")).alias("n_ret_supp"),
        F.sum("ret_rows").alias("n_ret_rows"),
        F.max(F.when(F.col("ret_rows") > 0, F.col("l_suppkey"))).alias("ret_suppkey"),
    )
    fin_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sole = ordstats.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    return (
        sole.join(fin_orders, sole.l_orderkey == fin_orders.o_orderkey, "left_semi")
        .join(supp, sole.ret_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_ret_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def v_c(spark, sf_dir):  # candidate: one fact exchange
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(F.col("l_orderkey"))
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret_rows")
    )
    ordstats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("ret_rows") > 0).cast("int")).alias("n_ret_supp"),
        F.sum("ret_rows").alias("n_ret_rows"),
        F.max(F.when(F.col("ret_rows") > 0, F.col("l_suppkey"))).alias("ret_suppkey"),
    )
    fin_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sole = ordstats.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    return (
        sole.join(fin_orders, sole.l_orderkey == fin_orders.o_orderkey, "left_semi")
        .join(supp, sole.ret_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_ret_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def main() -> None:
    rounds = 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(app_name="q21-probe")
    variants = {"A_r15": v_a, "B_r16": v_b, "C_repart": v_c}
    # result-equivalence check first (collect + compare)
    ref = None
    for name, fn in variants.items():
        rows = [tuple(r) for r in fn(spark, "/root/testdata/sf0.01").collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} result differs!"
    print(f"# all variants equal on sf0.01 ({len(ref)} rows)")
    # warm
    for fn in variants.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {k: [] for k in variants}
    order = list(variants.items())
    for r in range(rounds):
        seq = order if r % 2 == 0 else list(reversed(order))
        for name, fn in seq:
            spark.sparkContext.setJobDescription(f"q21:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"# round {r}: "
            + "  ".join(f"{n}={times[n][-1]:.3f}s" for n in variants)
        )
    import statistics

    for name, ts in times.items():
        print(
            f"{name}: median={statistics.median(ts):.4f}s "
            f"best={min(ts):.4f}s all=" + ",".join(f"{t:.3f}" for t in ts)
        )


if __name__ == "__main__":
    main()
