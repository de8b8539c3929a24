"""Measure the LSH auto-sizer's cost-vs-threshold scaling law at fixed
corpus density (SCALE_PROBE.md round 11 "rho-exponent, measured").

Two measurements, both emitted as one-line JSON records:

1. Threshold sweep over the inflated probe corpus
   (``/tmp/tis_scale_probe/x30`` by default — build it with
   ``python tools/scale_probe.py /root/testdata/sf0.1 30 lsh_auto``):
   wall + within-copy recall of ``cosine_edges(candidates='lsh_auto')``
   at thresholds 0.60 and 0.80. The sf0.1 fixture has at most one true
   pair above 0.60, so recall is null there by honest design — the wall
   collapse is the signal.
2. Planted near-dup recall at the same 60k density: 59k random
   background + 100 clusters of 10 vectors at within-cluster cosine
   ~0.72 (``v = sqrt(rho)*c + sqrt(1-rho)*g``), ground truth
   brute-forced exactly on the planted subset, auto path run at
   threshold 0.60.

Usage: python tools/threshold_recall_probe.py [x30_dir]
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np
from pyspark.sql import functions as F

from tutorial_iceberg_spark import scratch
from tutorial_iceberg_spark.functions.vector import lsh_auto_size
from tutorial_iceberg_spark.operators import graph as G
from tutorial_iceberg_spark.session import get_spark

ID_STRIDE = 10_000_000  # scale_probe's copy stride
BASE = "/root/testdata/sf0.1"


def threshold_sweep(spark, big_dir: str) -> None:
    for t in (0.6, 0.8):
        truth = G.cosine_edges(
            spark, BASE, threshold=t, candidates="all_pairs"
        ).count()
        t0 = time.time()
        df = G.cosine_edges(spark, big_dir, threshold=t, candidates="lsh_auto")
        within = df.filter(
            F.floor(F.col("left_id") / ID_STRIDE)
            == F.floor(F.col("right_id") / ID_STRIDE)
        ).count()
        print(
            json.dumps(
                {
                    "threshold": t,
                    "corpus": "30x (60k vectors)",
                    "base_truth_edges": truth,
                    "within_copy_recall_30x": (
                        round(within / (30 * truth), 4) if truth else None
                    ),
                    "wall_30x_sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


def planted_near_dup(spark) -> None:
    rng = np.random.default_rng(42)
    dim, n_bg, n_cl, cl_sz, rho = 64, 59_000, 100, 10, 0.72
    bg = rng.standard_normal((n_bg, dim))
    clusters = []
    for _ in range(n_cl):
        c = rng.standard_normal(dim)
        c /= np.linalg.norm(c)
        g = rng.standard_normal((cl_sz, dim))
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        clusters.append(math.sqrt(rho) * c + math.sqrt(1 - rho) * g)
    vecs = np.vstack([bg, np.vstack(clusters)]).astype(np.float32)
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = u[n_bg:] @ u[n_bg:].T
    thresh = 0.6
    true_pairs = {
        (n_bg + ci * cl_sz + a, n_bg + ci * cl_sz + b)
        for ci in range(n_cl)
        for a in range(cl_sz)
        for b in range(a + 1, cl_sz)
        if sims[ci * cl_sz + a, ci * cl_sz + b] >= thresh
    }
    d = scratch.scratch_dir("tis_neardup_fixture")
    spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], "x") for i in range(len(vecs))],
        "vec_id bigint, embedding array<float>, label string",
    ).repartition(16).write.mode("overwrite").parquet(d + "/embeddings.parquet")
    t0 = time.time()
    found = {
        (r.left_id, r.right_id)
        for r in G.cosine_edges(
            spark, d, threshold=thresh, candidates="lsh_auto"
        ).collect()
    }
    s = lsh_auto_size(len(vecs), sim_threshold=thresh)
    print(
        json.dumps(
            {
                "n_vectors": len(vecs),
                "threshold": thresh,
                "planted_true_pairs": len(true_pairs),
                "recall_on_planted": round(
                    len(found & true_pairs) / len(true_pairs), 4
                ),
                "total_edges_found": len(found),
                "wall_sec": round(time.time() - t0, 1),
                "sizing": {
                    "b": s["bits_per_band"],
                    "L": s["n_bands"],
                    "expected_recall": round(s["expected_recall"], 3),
                },
            }
        ),
        flush=True,
    )


def main() -> None:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tis_scale_probe/x30"
    spark = get_spark(app_name="threshold-recall-probe")
    threshold_sweep(spark, big_dir)
    planted_near_dup(spark)


if __name__ == "__main__":
    main()
