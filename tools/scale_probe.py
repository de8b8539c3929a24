"""10x synthetic scaling probe for the super-linear-risk query family.

The 100 TB design claims for the dedup / ANN / graph operators rest on
"bucketed, not all-pairs" plan shapes. This probe converts those claims
from plan inspection into measured evidence: it inflates the three
LLM-pipeline tables ~FACTOR x, times each at-risk query at base and
inflated size, and re-asserts the plan-shape gates at the inflated size
(no BroadcastNestedLoopJoin, no CartesianProduct).

Inflation design — 10 ISOMETRIC copies, so linear growth is the exact
ground truth:

- embeddings: copy i flips the sign of each dimension by a deterministic
  per-(copy, dim) coin (xxhash64 parity). Sign flips cancel inside a
  same-copy dot product, so every within-copy cosine (and norm) is
  BIT-IDENTICAL to the base table; cross-copy cosines collapse to
  ~N(0, 1/sqrt(dim)) ~= +-0.125, far under COSINE_EDGE_THRESHOLD=0.40.
  The inflated similarity graph is therefore exactly `factor` disjoint
  copies of the base graph — edges, components, and triangles all scale
  exactly linearly, and any super-linear wall-time growth is the
  engine's fault, not the data's.
- documents: copy i suffixes every whitespace token with a copy marker
  (a token bijection), so within-copy shingle/Jaccard structure is
  exactly the base corpus and cross-copy token overlap is zero.
- events: id/user offsets per copy; per-user timelines mirror the base.

ids get copy*ID_STRIDE offsets (shared by doc_id and vec_id — the
semantic-dedup join key contract). Non-inflated tables are file-copied so
every registered query still runs against the probe dir.

Usage:
    python tools/scale_probe.py [base_sf_dir] [factor] [name ...]
Defaults: /root/testdata/sf0.1, 10x, the 14-query at-risk family.
Emits one JSON line per query plus a summary line; SCALE_PROBE.md is
written from the captured rows by hand (the narrative matters more than
the numbers).

NOTE on the auto-gate: 10x the sf0.1 embeddings table (20k rows) crosses
ALL_PAIRS_MAX_ROWS, so cosine_edges-fed queries switch from the exact
all-pairs baseline to the banded-LSH candidate path — by design. Those
growth factors compare different algorithms (marked `gate_switch` in the
output); the algorithm-consistent LSH-vs-LSH growth is probed separately
via the [lsh]-suffixed rows, which force candidates="lsh" at BOTH sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tutorial_iceberg_spark.io import TABLES, load_table, table_path  # noqa: E402
from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402

ID_STRIDE = 10_000_000  # shared by doc_id/vec_id/user_id copies
EV_STRIDE = 1_000_000_000

# The at-risk family (VERDICT r7 #1 next-round list): every query whose
# cost COULD go super-linear if a candidate cap / bucketing contract
# silently broke.
DEFAULT_PROBES = [
    "x_dedup_minhash_lsh",
    "x_dedup_minhash_md5",
    "x_dedup_ngram_jaccard",
    "x_dedup_incremental",
    "x_sim_join_threshold",
    "x_dedup_semantic_cc",
    "x_semantic_dedup_corpus",
    "x_ann_ivf_cosine",
    "x_ann_hyperplane_lsh",
    "x_ann_ivf_pq",
    "x_knn_classify_loo",
    "x_triangle_count",
    "x_pagerank_sim",
    "x_cooccur_pairs",
]

# Queries whose registered form crosses the ALL_PAIRS_MAX_ROWS auto-gate
# between base (2k embeddings) and 10x (20k): their base/10x timings
# compare different algorithms (exact all-pairs vs banded LSH).
GATE_SWITCHERS = {
    "x_sim_join_threshold",
    "x_dedup_semantic_cc",
    "x_semantic_dedup_corpus",
    "x_triangle_count",
    "x_pagerank_sim",
    "x_knn_classify_loo",
}

# Queries whose ONLY nested-loop join is a crossJoin against a broadcast
# side of schema/parameter-bounded size (tests/test_plans.py ALLOWED
# sweep proves every such site): the IVF family crossJoins each vector /
# query against the N_CELLS=16 centroid frame to pick cells — an O(n*16)
# linear scan, the intended assignment step, planned by Spark as
# BroadcastNestedLoopJoin (tests/test_vector.py:55 asserts exactly this
# shape). A BNLJ here is NOT a scale defect; one against a grown side is.
BNLJ_BOUNDED_OK = {
    "x_ann_ivf_cosine",  # crossJoin(broadcast(cents)), 16 rows
    "x_ann_ivf_pq",  # same coarse quantizer + 16-row codebook LUT
    # 1-row scalar-aggregate crossJoins (corpus stats / doc count /
    # median-derived cap): Spark plans crossJoin(broadcast(<1 row>)) as
    # BroadcastNestedLoopJoin; the sides are aggregates, not tables, so
    # they cannot grow (tests/test_plans.py ALLOWED sweep proves each)
    "x_bm25_search",
    "x_tfidf_terms",
    "x_keyword_extract",
    "x_source_cap",
}


def _inflate_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    # per-(copy, dim) sign flip: the index arg of the transform lambda is
    # the element position (a Column); xxhash64 parity of (dim + copy*97)
    # is the deterministic coin. Bind the copy index via a factory — a
    # default arg would change the lambda's arity and Spark rejects
    # 3-parameter HOF lambdas.
    def _flip(i: int):
        def f(v, j):
            return (
                v
                * F.when(
                    F.pmod(F.xxhash64(j + F.lit(i * 97)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).cast("float")

        return f

    out = emb
    for i in range(1, factor):
        flip = _flip(i)
        out = out.unionByName(
            emb.select(
                (F.col("vec_id") + i * ID_STRIDE).alias("vec_id"),
                F.transform("embedding", flip).alias("embedding"),
                "label",
            )
        )
    return out


def _inflate_documents(docs: DataFrame, factor: int) -> DataFrame:
    out = docs
    for i in range(1, factor):
        # token bijection: suffix every token with a copy marker (letter
        # separator — a digit would parse as part of the group reference)
        text = F.regexp_replace("text", r"(\S+)", f"$1q{i}")
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + i * ID_STRIDE).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).alias("n_chars"),
            )
        )
    return out


def _inflate_events(ev: DataFrame, factor: int) -> DataFrame:
    out = ev
    for i in range(1, factor):
        out = out.unionByName(
            ev.select(
                (F.col("event_id") + i * EV_STRIDE).alias("event_id"),
                "ts",
                (F.col("user_id") + i * ID_STRIDE).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    return out


def build_inflated(
    spark: SparkSession, base_dir: str, out_dir: str, factor: int
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    infl = {
        "embeddings": _inflate_embeddings,
        "documents": _inflate_documents,
        "events": _inflate_events,
    }
    for t in TABLES:
        dst = table_path(out_dir, t)
        if t in infl:
            df = infl[t](load_table(spark, base_dir, t), factor)
            # multi-file directory layout — the shape a real table has;
            # the partition-invariance sweep proved queries don't care
            df.repartition(8).write.mode("overwrite").parquet(dst)
        else:
            shutil.copyfile(table_path(base_dir, t), dst)


def _plan_of(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _probe_callables(specs):
    """name -> builder for every probed row, including the
    algorithm-consistent [lsh] twins that force the scale path at BOTH
    sizes."""
    from tutorial_iceberg_spark.functions.vector import x_knn_classify_loo
    from tutorial_iceberg_spark.operators.graph import cosine_edges

    rows: dict[str, object] = {}
    for n in DEFAULT_PROBES:
        rows[n] = specs[n].builder
    rows["cosine_edges[lsh]"] = lambda s, d: cosine_edges(
        s, d, candidates="lsh"
    )
    rows["x_knn_classify_loo[lsh]"] = lambda s, d: x_knn_classify_loo(
        s, d, candidates="lsh"
    )
    return rows


def main() -> None:
    args = sys.argv[1:]
    base_dir = args[0] if args else "/root/testdata/sf0.1"
    factor = int(args[1]) if len(args) > 1 else 10
    name_filter = args[2:]

    spark = get_spark(app_name="scale-probe")
    specs = all_queries()
    rows = _probe_callables(specs)
    # any registered query can be probed by exact name, beyond the
    # default at-risk family
    for f in name_filter:
        if f in specs and f not in rows:
            rows[f] = specs[f].builder
    if name_filter:
        rows = {
            n: b
            for n, b in rows.items()
            if any(f in n for f in name_filter)
        }

    probe_dir = os.path.join(
        tempfile.gettempdir(), "tis_scale_probe", f"x{factor}"
    )
    marker = os.path.join(probe_dir, "_built_from")
    stamp = f"{base_dir}|{factor}"
    if not (os.path.exists(marker) and open(marker).read() == stamp):
        t0 = time.perf_counter()
        build_inflated(spark, base_dir, probe_dir, factor)
        with open(marker, "w") as fh:
            fh.write(stamp)
        print(
            f"# inflated {base_dir} x{factor} -> {probe_dir} "
            f"({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )

    # warm-up at the smallest SF: JIT + codegen caches, none of the data
    for n, b in rows.items():
        try:
            b(spark, "/root/testdata/sf0.001").collect()
        except Exception as e:
            print(f"# warmup {n} failed: {e}", file=sys.stderr)

    # best-of-N (host shows +-15% single-run noise; a growth factor built
    # from two single runs compounds it)
    RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))

    def timed(builder, d):
        best, nrows = float("inf"), 0
        for _ in range(RUNS):
            t0 = time.perf_counter()
            nrows = len(builder(spark, d).collect())
            best = min(best, time.perf_counter() - t0)
        return best, nrows

    results = []
    for n, b in rows.items():
        t_base, base_rows = timed(b, base_dir)

        df_big = b(spark, probe_dir)
        plan = _plan_of(df_big)
        gates = {
            "bnlj": "BroadcastNestedLoopJoin" in plan,
            "cartesian": "CartesianProduct" in plan,
        }
        t_big, big_rows = timed(b, probe_dir)

        # measured recall of the capped-LSH edge generator on the
        # inflated table: within-copy edges are bit-identical copies of
        # the base graph, so ground truth is exactly factor * |exact
        # base edges| (the cross-copy noise edges the threshold also
        # admits are excluded — they are data, not structure).
        recall = None
        if n == "cosine_edges[lsh]":
            from tutorial_iceberg_spark.operators.graph import cosine_edges

            exact_base = cosine_edges(
                spark, base_dir, candidates="all_pairs"
            ).count()
            within = (
                df_big.filter(
                    F.floor(F.col("left_id") / ID_STRIDE)
                    == F.floor(F.col("right_id") / ID_STRIDE)
                ).count()
            )
            recall = round(within / (factor * exact_base), 4)

        rec = {
            "query": n,
            "t_base_sec": round(t_base, 3),
            "t_10x_sec": round(t_big, 3),
            "wall_growth": round(t_big / t_base, 2) if t_base > 0 else None,
            "rows_base": base_rows,
            "rows_10x": big_rows,
            "rows_growth": round(big_rows / base_rows, 2)
            if base_rows
            else None,
            "gate_switch": n in GATE_SWITCHERS,
            "within_copy_recall_10x": recall,
            "plan_bnlj_10x": gates["bnlj"],
            "bnlj_bounded_ok": n in BNLJ_BOUNDED_OK,
            "plan_cartesian_10x": gates["cartesian"],
        }
        results.append(rec)
        print(json.dumps(rec))

    bad = [
        r["query"]
        for r in results
        if (r["plan_bnlj_10x"] and r["query"] not in BNLJ_BOUNDED_OK)
        or r["plan_cartesian_10x"]
    ]
    print(
        json.dumps(
            {
                "summary": "scale_probe",
                "base": base_dir,
                "factor": factor,
                "queries": len(results),
                "plan_gate_failures": bad,
            }
        )
    )


if __name__ == "__main__":
    main()
