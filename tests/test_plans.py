"""Broadcast-policy and plan-shape gates (the 100 TB regression tripwires).

Policy (VERDICT r5 finding 1): hard ``F.broadcast`` hints are allowed ONLY
on sides whose size is provably bounded — schema-bounded dims (nation = 25
rows, region = 5 rows), 1-row scalar aggregates, centroid/query/permutation
sets whose cardinality is a function parameter, and eval-benchmark n-gram
sets. customer / part / supplier / lineitem / orders grow linearly with
scale factor: a hard hint on them disables both AQE's runtime judgment and
Spark's shuffle fallback (driver broadcasts >8 GB hard-fail), so what works
at sf0.1 is an OOM at 100x. Those joins carry no hint; AQE still broadcasts
them at bench scale and shifts to shuffle joins at cluster scale.

Two gates enforce this:

1. a source-level allowlist sweep — every ``F.broadcast(`` occurrence in the
   package must match a known-bounded argument pattern, so a new hard hint
   on a linear-growth table cannot land silently;
2. plan probes — with the auto-broadcast threshold disabled (simulating a
   dim too big to broadcast), formerly-hinted q-series joins must degrade
   to shuffle joins, while the schema-bounded nation/region hints still
   produce BroadcastHashJoin.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parent.parent / "tutorial_iceberg_spark"

# Argument prefixes that are provably bounded, per site. Keys are file
# names; values are regexes the broadcast ARGUMENT must match. Anything
# else — in these files or any other — fails the sweep.
ALLOWED = {
    "lakehouse/queries.py": [
        # lake_txn_multi_table: a literal 1-row (fact_rows) frame joined
        # onto the (|priorities|-row) rollup read — both sides bounded
        r'spark\.createDataFrame\(\[\(n_fact,\)\], "fact_rows bigint"\)',
    ],
    "operators/relational.py": [
        r'load_table\(spark, sf_dir, "(nation|region)"\)',  # 25 / 5 rows
        r"nation\b",  # nation dim frame
        r"nation_region\b",  # nation |x| region (<= 25 rows)
        r"salts\b",  # salt-explode helper: SALT_N literal rows
        r"offsets\b",  # distributed_row_number: <= n_partitions offset rows
    ],
    "operators/tpch_extra.py": [
        r'load_table\(spark, sf_dir, "(nation|region)"\)',
        r"nat\.",  # filtered nation frame
        r"nr\b",  # nation |x| region
        r"load_table\(spark, sf_dir, \"nation\"\)\.join",  # nation chain
        r"mean\b",  # 1-row scalar aggregate
        r"mx\b",  # 1-row scalar aggregate
        r"avg_bal\b",  # 1-row scalar aggregate
    ],
    "functions/vector.py": [
        r"q$",  # query set: bounded by n_queries parameter
        r"qv\b",  # query vectors (same set)
        r"q_bands\b",  # per-query LSH bands (n_queries x bands)
        r"cents\b",  # k-means centroids: n_cells x dim, a parameter
        r"cent\b",  # per-label centroids: |labels| rows, bounded domain
        r"tot\b",  # 1-row (total, n_classes) aggregate (x_class_weights)
        r"probes\b",  # query->cell probe pairs: n_queries x n_probe
        r"b$",  # kNN-LOO all-pairs baseline, gated to ALL_PAIRS_MAX_ROWS
        # first-collision dedup key table: caller-gated to the
        # _BROADCAST_EST_MAX_BYTES budget (distinct() fallback above)
        r"keys_by_vec\.select\(",
        # kNN-LOO lsh verification sides: gated to the
        # embedding_broadcast_affordable bytes budget (AQE fallback
        # above) — same discipline as graph.py's left/right
        r"left_emb$",
        r"right_emb$",
    ],
    "functions/text.py": [
        r"n_docs\b",  # 1-row corpus-size scalar
        r"cap\b",  # 1-row median-derived per-source cap (x_source_cap)
        r"corpus_stats\b",  # 1-row (N, avgdl) aggregate
        r"term_df\b",  # BM25 df table: |query terms| rows
        r"n$",  # 1-row doc-count aggregate (x_tfidf_terms)
        r"decr_tot\b",  # 1-row Misra-Gries decrement total (x_topk_sketch)
    ],
    "operators/dedup.py": [
        r"pos\b",  # shingle-position frame: n_hashes permutation rows
    ],
    "operators/pipeline.py": [
        r"eval_grams\b",  # eval-benchmark 5-grams: eval set is fixed-size
        r"tot\b",  # 1-row corpus-total aggregate (x_mixture_plan)
        r"stats\b",  # 1-row global group-size stats (x_skew_profile)
        r"mn\b",  # 1-row min-day scalar (x_retention_bitmap)
        r"rates\.select\(",  # per-lang rate frame: |langs| rows (x_mixture_sample)
        r"days\b",  # bounded day grid, RETENTION_BITMAP_DAYS rows
    ],
    "streaming/events_stream.py": [
        r"err_tot\b",  # 1-row Misra-Gries decrement total (x_stream_heavy_users)
        r"days\b",  # bounded day grid (x_stream_retention_bitmap)
    ],
    "operators/graph.py": [
        r"b$",  # all-pairs oracle baseline, gated to small inputs only
        r"dangling\b",  # 1-row dangling-mass aggregate (pagerank)
        # lsh_auto verification sides: gated to the
        # _BROADCAST_EST_MAX_BYTES budget (AQE fallback above)
        r"left$",
        r"right$",
    ],
}

_LINEAR_TABLES = ("customer", "part", "supplier", "lineitem", "orders")


def _broadcast_args(text: str):
    """Yield the argument text of each F.broadcast( call (paren-matched)."""
    for m in re.finditer(r"F\.broadcast\(", text):
        depth, start = 1, m.end()
        i = start
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield " ".join(text[start : i - 1].split())


def test_no_hard_broadcast_on_linear_growth_tables():
    hits, unknown = [], []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG).as_posix()
        allowed = [re.compile(p) for p in ALLOWED.get(rel, [])]
        for arg in _broadcast_args(py.read_text()):
            if any(p.match(arg) for p in allowed):
                # belt-and-braces: even an allowlisted arg must not load a
                # linear-growth table
                for t in _LINEAR_TABLES:
                    if f'"{t}"' in arg:
                        hits.append(f"{rel}: F.broadcast({arg})")
                continue
            unknown.append(f"{rel}: F.broadcast({arg})")
    assert not hits, f"hard broadcast on linear-growth table: {hits}"
    assert not unknown, (
        "unallowlisted F.broadcast site(s) — prove the side is bounded and "
        f"add it to tests/test_plans.py ALLOWED, or drop the hint: {unknown}"
    )


@pytest.fixture(scope="module")
def sf_correct():
    from tests.conftest import SF_CORRECT

    return SF_CORRECT


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _with_threshold(spark, value):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", value)
    return prev


# Queries whose dim joins were force-broadcast through r5 (VERDICT r5
# finding 1 site list) and are now AQE's call. One representative per
# formerly-hinted table: customer, part, supplier. The int is the number
# of BroadcastHashJoins that may legitimately SURVIVE threshold=-1 — the
# schema-bounded nation/region hints inside the query, nothing else.
_FORMERLY_HINTED = [
    ("q18_large_volume_orders", "relational", 0),  # customer
    ("q14_promo_revenue", "relational", 0),  # part
    ("q21_sole_returning_supplier", "relational", 0),  # supplier
    ("q9_product_profit", "tpch_extra", 1),  # part + supplier; 1 = nation hint
]


@pytest.mark.parametrize("qname,module,bounded_hints", _FORMERLY_HINTED)
def test_dehinted_joins_degrade_to_shuffle_at_scale(
    spark, sf_correct, qname, module, bounded_hints
):
    """With auto-broadcast off (a stand-in for 'the dim no longer fits'),
    the only BroadcastHashJoins that may remain are the schema-bounded
    nation/region hints: every linear-growth-table join must fall back to
    a shuffle join. A surplus BHJ means a hard hint regressed in."""
    from tutorial_iceberg_spark.operators import relational, tpch_extra

    fn = getattr({"relational": relational, "tpch_extra": tpch_extra}[module], qname)
    prev = _with_threshold(spark, "-1")
    try:
        plan = _plan(fn(spark, sf_correct))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the formatted explain prints each node once in the tree and once in
    # the detail section — count tree occurrences via the detail headers
    n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
    assert n_bhj == bounded_hints, f"{qname}: hard hint regressed ({n_bhj} BHJ)"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


@pytest.mark.parametrize("qname,module,bounded_hints", _FORMERLY_HINTED)
def test_dehinted_joins_still_broadcast_at_bench_scale(
    spark, sf_correct, qname, module, bounded_hints
):
    """At the default threshold the same queries must still plan
    BroadcastHashJoin on the small dim side — dropping the hints costs
    nothing at sf0.01/sf0.1 because size estimates pick the same plan."""
    from tutorial_iceberg_spark.operators import relational, tpch_extra

    fn = getattr({"relational": relational, "tpch_extra": tpch_extra}[module], qname)
    plan = _plan(fn(spark, sf_correct))
    assert "BroadcastHashJoin" in plan, f"{qname}: expected stats-chosen BHJ"


def test_bounded_dim_hints_survive_threshold_off(spark, sf_correct):
    """nation/region keep their hard hints (schema-bounded): with the
    threshold off, j2_star must still broadcast those two sides while the
    de-hinted customer side degrades to a shuffle join."""
    from tutorial_iceberg_spark.operators import relational as R

    prev = _with_threshold(spark, "-1")
    try:
        plan = _plan(R.j2_star_join_revenue(spark, sf_correct))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
    assert n_bhj == 2  # nation + region hints
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # customer
