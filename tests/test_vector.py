"""Similarity-search tests: exactness of the brute-force path, recall of
the IVF path against it, and plan-shape gates (broadcast query set, no
Python UDFs — the whole module must stay in whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tutorial_iceberg_spark.functions import vector as V
from tutorial_iceberg_spark.io import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_knn_shape_and_bounds(spark, sf_dir):
    rows = V.x_knn_brute_cosine(spark, sf_dir).collect()
    assert len(rows) == V.N_QUERIES * V.TOP_K
    assert all(-1.0 - 1e-9 <= r["score"] <= 1.0 + 1e-9 for r in rows)
    for q in range(V.N_QUERIES):
        scores = [r["score"] for r in rows if r["query_id"] == q]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows if r["query_id"] == q)


def test_knn_self_similarity_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(3)
    r = emb.select(
        (V.dot(F.col("embedding"), F.col("embedding")) / (V.norm(F.col("embedding")) ** 2)).alias(
            "s"
        )
    ).collect()
    assert all(abs(x["s"] - 1.0) < 1e-9 for x in r)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in V.x_knn_brute_cosine(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in V.x_ann_ivf_cosine(spark, sf_dir).collect()
    }
    recall = len(brute & ivf) / len(brute)
    # nprobe=4/16 cells on clustered synthetic data: expect decent recall
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_knn_broadcasts_queries_and_stays_jvm(spark, sf_dir):
    plan = plan_of(V.x_knn_brute_cosine(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
