"""x_dedup_incremental capped-posting-list variants, interleaved (r17).

W: r16 window form   (COUNT(*) OVER (PARTITION BY s) <= CAP, checkpoint)
B: census + BROADCAST anti-join (hint), checkpoint capped
M: census + MERGE anti-join (hint), checkpoint capped

Usage: python tools/dedup_cap_probe.py [--rounds=N] [--sf=DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: E402

from tutorial_iceberg_spark.io import load_table  # noqa: E402
from tutorial_iceberg_spark.operators.dedup import (  # noqa: E402
    BATCH_MOD,
    SHINGLE_DF_CAP,
    shingles,
)
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, mode):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_batch", F.col("doc_id") % BATCH_MOD == 0
    )
    n_part = spark.sparkContext.defaultParallelism
    post = docs.repartition(n_part, "doc_id").select(
        "doc_id", "is_batch", F.explode(shingles()).alias("s")
    )
    if mode == "W":
        capped = (
            post.withColumn("df", F.count("*").over(Window.partitionBy("s")))
            .filter(F.col("df") <= SHINGLE_DF_CAP)
            .drop("df")
            .localCheckpoint(eager=False)
        )
    else:
        hot = (
            post.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > SHINGLE_DF_CAP)
            .select("s")
        )
        hint = "broadcast" if mode == "B" else "merge"
        capped = post.join(hot.hint(hint), "s", "left_anti").localCheckpoint(
            eager=False
        )
    sz = capped.groupBy("doc_id").agg(F.count("*").alias("n"))
    b = capped.filter(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_id"), "s"
    )
    c = capped.filter(~F.col("is_batch")).select(
        F.col("doc_id").alias("corpus_id"), "s"
    )
    pairs = b.join(c, "s").groupBy("batch_id", "corpus_id").agg(
        F.count("*").alias("i")
    )
    sb = sz.select(F.col("doc_id").alias("batch_id"), F.col("n").alias("nb"))
    sc_ = sz.select(F.col("doc_id").alias("corpus_id"), F.col("n").alias("nc"))
    scored = (
        pairs.join(sb, "batch_id")
        .join(sc_, "corpus_id")
        .select(
            "batch_id",
            (
                F.col("i").cast("double")
                / (F.col("nb") + F.col("nc") - F.col("i"))
            ).alias("jaccard"),
        )
    )
    summary = scored.groupBy("batch_id").agg(
        F.count("*").alias("n_candidates"),
        F.max("jaccard").alias("best_jaccard"),
    )
    batch_ids = docs.filter(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_id")
    )
    best = F.coalesce(F.col("best_jaccard"), F.lit(0.0))
    return (
        batch_ids.join(summary, "batch_id", "left")
        .select(
            "batch_id",
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            best.alias("best_jaccard"),
            F.when(best >= 0.5, 1).otherwise(0).alias("is_dup"),
        )
        .orderBy("batch_id")
    )


def main() -> None:
    rounds = 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(app_name="dedup-cap-probe")
    modes = ("W", "B", "M")
    ref = None
    for m in modes:
        rows = [tuple(r) for r in build(spark, "/root/testdata/sf0.01", m).collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"{m} differs"
    print(f"# variants equal on sf0.01 ({len(ref)} rows)")
    for m in modes:
        build(spark, sf_dir, m).write.format("noop").mode("overwrite").save()
    times = {m: [] for m in modes}
    for r in range(rounds):
        seq = modes if r % 2 == 0 else tuple(reversed(modes))
        for m in seq:
            t0 = time.perf_counter()
            build(spark, sf_dir, m).write.format("noop").mode("overwrite").save()
            times[m].append(time.perf_counter() - t0)
        print("# round", r, {m: round(times[m][-1], 3) for m in modes})
    for m in modes:
        print(
            f"{m}: median={statistics.median(times[m]):.4f} "
            + ",".join(f"{t:.3f}" for t in times[m])
        )


if __name__ == "__main__":
    main()
