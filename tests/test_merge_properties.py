"""Property-based MERGE semantics: every arm combination against a
python-dict reference model (hypothesis).

MERGE is the most intricate mutation the engine ships (matched/unmatched
arms x conditions x not-matched-by-source). The model is ~15 lines of
dict code; if Spark's join-composition implementation ever diverges from
it on ANY generated (target, source, arms) combination, this fails.

Examples are deliberately few (each runs real Spark jobs) but each example
sweeps randomized key overlap, a condition that splits the source, and
every arm combination.
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog

DDL = "k bigint, grp int, v bigint"


def _model(
    target: dict[int, tuple],
    source: dict[int, tuple],
    when_matched: str,
    when_not_matched: str,
    armed: set[int],
    by_source_delete: bool,
) -> dict[int, tuple]:
    out: dict[int, tuple] = {}
    for k, row in target.items():
        if k not in source:
            if not by_source_delete:
                out[k] = row
        elif when_matched == "none" or k not in armed:
            out[k] = row
        elif when_matched == "update_all":
            out[k] = source[k]
        # delete + armed: gone
    if when_not_matched == "insert_all":
        for k, row in source.items():
            if k not in target:
                out[k] = row
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tkeys=st.sets(st.integers(0, 12), min_size=1, max_size=8),
    skeys=st.sets(st.integers(0, 12), min_size=1, max_size=8),
    null_keys=st.sets(st.integers(0, 12), max_size=4),
    arm_grp=st.integers(0, 2),
    when_matched=st.sampled_from(["update_all", "delete", "none"]),
    when_not_matched=st.sampled_from(["insert_all", "none"]),
    by_source=st.sampled_from(["none", "delete"]),
)
def test_merge_matches_dict_model(
    spark, tkeys, skeys, null_keys, arm_grp, when_matched, when_not_matched, by_source
):
    # Source rows in null_keys carry grp=NULL, so the matched condition
    # `grp = arm_grp` evaluates to NULL — ANSI MERGE treats non-TRUE as
    # unarmed (target row kept), which the model encodes by excluding them
    # from `armed` (r2 ADVICE: a NULL condition must never delete the row).
    target = {k: (k, k % 3, 100 + k) for k in tkeys}
    source = {k: (k, None if k in null_keys else k % 3, 200 + k) for k in skeys}
    armed = {k for k in skeys if k not in null_keys and k % 3 == arm_grp}
    expect = _model(
        target, source, when_matched, when_not_matched, armed,
        by_source == "delete",
    )
    with tempfile.TemporaryDirectory() as wh:
        cat = LakeCatalog(spark, wh)
        t = cat.create_table("db.m", DDL)
        t.append(spark.createDataFrame(list(target.values()), DDL))
        t.merge(
            spark.createDataFrame(list(source.values()), DDL),
            on="k",
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            matched_condition=f"grp = {arm_grp}",
            when_not_matched_by_source=by_source,
        )
        got = {r["k"]: (r["k"], r["grp"], r["v"]) for r in t.read().collect()}
    assert got == expect, (
        f"arms=({when_matched},{when_not_matched},{by_source},grp={arm_grp}) "
        f"t={sorted(tkeys)} s={sorted(skeys)}"
    )


def _apply_changelog(old: dict[int, tuple], log_rows) -> dict[int, tuple]:
    """CDC consumer model: INSERT adds, DELETE removes, UPDATE_AFTER
    replaces (UPDATE_BEFORE is the audit image, a no-op for state)."""
    out = dict(old)
    for r in log_rows:
        k = r["k"]
        if r["change_type"] == "INSERT":
            assert k not in out
            out[k] = (r["k"], r["grp"], r["v"])
        elif r["change_type"] == "DELETE":
            assert out.pop(k, None) is not None
        elif r["change_type"] == "UPDATE_BEFORE":
            assert out[k] == (r["k"], r["grp"], r["v"])  # pre-image matches
        elif r["change_type"] == "UPDATE_AFTER":
            assert k in out
            out[k] = (r["k"], r["grp"], r["v"])
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(st.integers(0, 15), min_size=2, max_size=10),
    del_mod=st.integers(2, 4),
    upd_mod=st.integers(2, 4),
    ins_keys=st.sets(st.integers(20, 30), max_size=5),
)
def test_changelog_applies_back_to_new_state(
    spark, keys, del_mod, upd_mod, ins_keys
):
    """The defining CDC invariant: old_state + changelog == new_state, for
    arbitrary delete/update/insert mixes (snapshot_changelog is computed
    generically from the two reads, so this exercises the full-outer join
    + struct-compare split, including the UPDATE pre-image)."""
    from tutorial_iceberg_spark.lakehouse.queries import snapshot_changelog

    with tempfile.TemporaryDirectory() as wh:
        cat = LakeCatalog(spark, wh)
        t = cat.create_table("db.cdc", DDL)
        t.append(
            spark.createDataFrame([(k, k % 3, 100 + k) for k in keys], DDL)
        )
        first = t.meta.snapshots[0].snapshot_id
        old = {r["k"]: (r["k"], r["grp"], r["v"]) for r in t.read().collect()}
        t.delete(f"k % {del_mod} = 0")
        t.update(f"k % {upd_mod} = 1", {"v": "v + 1000"})
        if ins_keys:
            t.append(
                spark.createDataFrame(
                    [(k, k % 3, 300 + k) for k in ins_keys], DDL
                )
            )
        new = {r["k"]: (r["k"], r["grp"], r["v"]) for r in t.read().collect()}
        log = snapshot_changelog(t, first, ["k"]).collect()
    assert _apply_changelog(old, log) == new
