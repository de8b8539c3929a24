"""Multi-table atomic transaction invariants (r11 verdict Next #8).

The property under test everywhere: N tables commit TOGETHER or NOT AT
ALL — no interleaving of phases, conflicts, decision races, or crash
windows may ever expose table A's new state alongside table B's old one.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from tutorial_iceberg_spark.lakehouse import metadata as M
from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog
from tutorial_iceberg_spark.lakehouse.transaction import (
    LakeTransaction,
    TransactionAborted,
)


@pytest.fixture()
def cat(spark):
    with tempfile.TemporaryDirectory() as wh:
        yield LakeCatalog(spark, wh)


def _mk(cat, spark):
    a = cat.create_table("db.txa", "k bigint, v string")
    b = cat.create_table("db.txb", "k bigint, n bigint")
    a.append(spark.createDataFrame([(1, "x")], "k bigint, v string"))
    b.append(spark.createDataFrame([(1, 10)], "k bigint, n bigint"))
    return a, b


def test_txn_commits_both_or_neither_happy_path(cat, spark):
    a, b = _mk(cat, spark)
    with cat.transaction() as txn:
        txn.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
        txn.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
        # inside the block nothing is visible yet (not even prepared)
        assert a.read().count() == 1 and b.read().count() == 1
    assert sorted(r["k"] for r in a.read().collect()) == [1, 2]
    assert sorted(r["k"] for r in b.read().collect()) == [1, 2]
    # finalize happened: no pending markers, hints current, record gone
    for t in (a, b):
        md = t.meta
        assert md.pending_txn is None
        assert md.snapshot().summary.get("txn")
    assert not os.listdir(os.path.join(cat.warehouse, "_txns"))


def test_txn_prepared_window_is_invisible_until_decision(cat, spark):
    """Step through the phases: after PREPARE both tables still read
    their old state; the instant the decision record says committed,
    both flip — that single link() is the atomic commit point."""
    a, b = _mk(cat, spark)
    txn = cat.transaction()
    txn.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    txn.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    claimed = txn._prepare_once()
    assert len(claimed) == 2
    # prepared versions exist on disk but resolve invisible
    for loc, v in claimed:
        assert os.path.exists(
            os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        )
        assert M.current_version(loc) == v - 1
    assert a.read().count() == 1 and b.read().count() == 1
    # a concurrent writer conflicts on the claimed slot, no clobber
    with pytest.raises(M.CommitConflictError):
        md = M.read_metadata(a.location)
        M.commit_metadata(a.location, md)
    # DECIDE: one atomic create flips both tables at once
    assert M.record_txn_decision(txn.decision_path, "committed") == "committed"
    assert a.read().count() == 2 and b.read().count() == 2
    txn._finalize(claimed)
    assert a.meta.pending_txn is None and b.meta.pending_txn is None
    assert a.read().count() == 2 and b.read().count() == 2


def test_txn_conflict_aborts_with_no_partial_application(cat, spark):
    """A conflicting single-table commit during PREPARE (after table A's
    slot is claimed, on table B's slot) must leave BOTH tables untouched
    by the txn once retries are exhausted — the claimed A slot is
    released, not left to half-apply."""
    a, b = _mk(cat, spark)
    txn = cat.transaction()
    txn.PREPARE_RETRIES = 1
    txn.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    txn.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))

    # sabotage: every prepare attempt loses table B's slot to a rival
    orig = M.commit_metadata

    def rival_wins_b(location, md, pending_txn=None):
        if location == b.location:
            rival = M.read_metadata(b.location)
            orig(b.location, rival)  # rival claims the slot first
        return orig(location, md, pending_txn=pending_txn)

    M.commit_metadata = rival_wins_b
    try:
        with pytest.raises(TransactionAborted):
            txn.commit()
    finally:
        M.commit_metadata = orig
    assert M.txn_decision(txn.decision_path) == "aborted"
    # A shows no txn rows and its claimed slot was released
    assert sorted(r["k"] for r in a.read().collect()) == [1]
    assert a.meta.pending_txn is None
    # B shows only the rival's (empty) commits, no txn rows
    assert sorted(r["k"] for r in b.read().collect()) == [1]
    # released slots are reusable: a normal append works afterwards
    a.append(spark.createDataFrame([(3, "z")], "k bigint, v string"))
    assert sorted(r["k"] for r in a.read().collect()) == [1, 3]


def test_txn_decision_race_abort_wins_cleanly(cat, spark):
    """If a resolver records ABORT between prepare and the committer's
    decide (the expired-txn reaping race), the committer must observe the
    loss, release its claims, and raise — never half-commit."""
    a, b = _mk(cat, spark)
    txn = cat.transaction()
    txn.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    txn.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    claimed = txn._prepare_once()
    assert M.record_txn_decision(txn.decision_path, "aborted") == "aborted"
    txn._done = False  # drive commit()'s decide path directly
    txn._prepare_once = lambda: claimed  # reuse the real claims
    with pytest.raises(TransactionAborted, match="aborted"):
        txn.commit()
    assert a.read().count() == 1 and b.read().count() == 1
    # slots are BURNED, never unlinked (the r12 TOCTOU fix): the files
    # persist, settled to the self-describing sentinel, invisible forever
    for loc, v in claimed:
        p = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        assert os.path.exists(p)
        import json

        with open(p) as f:
            assert json.load(f)["pending_txn"] == M.ABORTED_SENTINEL
        assert M.current_version(loc) < v
    # ...and both tables are writable past the burned slots
    a.append(spark.createDataFrame([(3, "z")], "k bigint, v string"))
    assert sorted(r["k"] for r in a.read().collect()) == [1, 3]


def test_txn_resolve_expired_aborts_stale_but_never_committed(cat, spark):
    a, b = _mk(cat, spark)
    # txn 1: prepared then crashed (no decision, process gone)
    t1 = cat.transaction()
    t1.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    c1 = t1._prepare_once()
    # make the prepared file look old
    for loc, v in c1:
        p = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        os.utime(p, (1, 1))
    # txn 2: freshly prepared, still live -> must NOT be resolved
    t2 = cat.transaction()
    t2.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    t2._prepare_once()
    resolved = LakeTransaction.resolve_expired(cat.warehouse, grace_sec=60)
    assert resolved == [os.path.basename(t1.decision_path)]
    assert M.txn_decision(t1.decision_path) == "aborted"
    assert M.txn_decision(t2.decision_path) is None
    # the aborted prepare is gone (slot released: table writable again)
    assert a.read().count() == 1
    a.append(spark.createDataFrame([(5, "w")], "k bigint, v string"))
    assert sorted(r["k"] for r in a.read().collect()) == [1, 5]
    # ...and the live txn can still commit
    assert M.record_txn_decision(t2.decision_path, "committed") == "committed"
    assert b.read().count() == 2
    # resolve can never un-commit: committed decision stands — and the
    # sweep FINALIZES the committed claim a crashed owner left marked
    # (strips the pending marker), duty 3 of resolve_expired
    assert LakeTransaction.resolve_expired(cat.warehouse, grace_sec=0) == []
    assert b.meta.pending_txn is None and b.read().count() == 2


def test_burned_slots_are_skipped_not_reused(cat, spark):
    """The r12 TOCTOU fix's core invariant, exercised at the metadata
    layer directly: an aborted prepare's version slot is permanently
    occupied (never unlinked) and permanently invisible; writers allocate
    PAST it and readers probe PAST it to later committed versions."""
    a, _b = _mk(cat, spark)
    base_v = M.current_version(a.location)
    # burn a slot: prepare then abort
    txn = cat.transaction()
    txn.append("db.txa", spark.createDataFrame([(7, "q")], "k bigint, v string"))
    claimed = txn._prepare_once()
    assert claimed == [(a.location, base_v + 1)]
    M.record_txn_decision(txn.decision_path, "aborted")
    # reader: burned slot is invisible, current stays below it
    assert M.current_version(a.location) == base_v
    # writer with PRE-BURN state commits fine — lands ABOVE the burned
    # slot, never reusing the path
    md = M.read_metadata(a.location)
    assert md.loaded_version == base_v
    v_new = M.commit_metadata(a.location, md)
    assert v_new == base_v + 2
    # reader probes past the burned slot to the new committed version
    assert M.current_version(a.location) == v_new
    # the burned file is still on disk, untouched
    assert os.path.exists(
        os.path.join(M.metadata_dir(a.location), f"v{base_v + 1}.metadata.json")
    )
    # settling it (resolver duty) changes nothing observable
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=0)
    assert M.current_version(a.location) == v_new


def test_txn_one_op_per_table_and_empty_txn(cat, spark):
    _mk(cat, spark)
    txn = cat.transaction()
    txn.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    with pytest.raises(ValueError, match="one per table"):
        txn.append("db.txa", spark.createDataFrame([(3, "z")], "k bigint, v string"))
    txn.abort()
    before = set(os.listdir(os.path.join(cat.warehouse, "_txns")))
    with cat.transaction():
        pass  # empty txn is a no-op: no decision litter, no commits
    assert set(os.listdir(os.path.join(cat.warehouse, "_txns"))) == before


def test_txn_exception_in_block_aborts(cat, spark):
    a, b = _mk(cat, spark)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.append(
                "db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string")
            )
            raise RuntimeError("boom")
    assert a.read().count() == 1 and b.read().count() == 1
    assert M.txn_decision(txn.decision_path) == "aborted"


def test_txn_properties_ride_the_atomic_commit(cat, spark):
    """The exactly-once sink primitive generalizes: per-table properties
    merge in the SAME decision-gated commit as the data."""
    a, b = _mk(cat, spark)
    with cat.transaction() as txn:
        txn.append(
            "db.txa",
            spark.createDataFrame([(2, "y")], "k bigint, v string"),
            properties={"ingest.batch": "42"},
        )
        txn.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    assert a.meta.properties["ingest.batch"] == "42"
    assert a.read().count() == 2 and b.read().count() == 2

def test_aborted_decision_records_are_swept_once_unreferenced(cat, spark):
    """Aborted decision records persist as the durable outcome (absence
    means IN-FLIGHT in this protocol), but must not accumulate forever:
    resolve_expired settles burned claims (pending marker -> sentinel),
    then garbage-collects decision records that no version file
    references anymore AND that are older than max(grace, GC_MIN_AGE).
    A record referenced by a crashed owner's unsettled claim survives
    the first sweep (which settles the claim) and goes on the second —
    the two-consecutive-sweeps property, with the age floor on top."""
    a, b = _mk(cat, spark)
    # txn 1: cleanly aborted before any prepare -> record only, zero refs
    t1 = cat.transaction()
    t1._ops["db.txa"] = None  # non-empty so abort() records a decision
    t1.abort()
    assert M.txn_decision(t1.decision_path) == "aborted"
    # txn 2: prepared, aborted, owner crashed BEFORE settling its claim
    t2 = cat.transaction()
    t2.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    c2 = t2._prepare_once()
    M.record_txn_decision(t2.decision_path, "aborted")
    for loc, v in c2:
        os.utime(os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json"), (1, 1))
    os.utime(t1.decision_path, (1, 1))
    os.utime(t2.decision_path, (1, 1))

    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=60)
    # t1's unreferenced record swept (backdated past the floor); t2's was
    # still referenced when the walk collected references, but its claim
    # is SETTLED by that walk — the version file stays, burned forever
    assert not os.path.exists(t1.decision_path)
    assert b.meta.pending_txn is None
    import json

    for loc, v in c2:
        p = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        assert os.path.exists(p)
        with open(p) as f:
            assert json.load(f)["pending_txn"] == M.ABORTED_SENTINEL
    os.utime(t2.decision_path, (1, 1))
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=60)
    assert not os.path.exists(t2.decision_path)
    # a fresh aborted record survives ANY sweep, even zero-grace: the
    # GC_MIN_AGE floor is what stops a just-aborted txn's record from
    # vanishing before its owner observes the loss (the reversal race)
    t3 = cat.transaction()
    t3._ops["db.txa"] = None
    t3.abort()
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=0)
    assert M.txn_decision(t3.decision_path) == "aborted"
    # committed table state was never touched
    assert a.read().count() == 1 and b.read().count() == 1


def test_txn_crash_matrix_every_phase_recovers(cat, spark):
    """Drive a crash at EVERY phase boundary of the burned-slot 2PC and
    assert the operator sweep restores a fully consistent, writable
    warehouse — the recovery contract the no-unlink redesign must keep:

    (a) crash after STAGE (data written, no claims): nothing visible,
        tables untouched and writable;
    (b) crash after PREPARE (claims, no decision): invisible; a sweep
        past grace aborts it; tables writable past the burned slots;
    (c) crash after DECIDE=committed, before FINALIZE: both tables read
        the new state immediately (visibility follows the record); the
        sweep strips the markers a dead owner left;
    (d) crash MID-FINALIZE (one marker stripped, one not): both visible
        throughout; the sweep finishes the strip; the record becomes
        unreferenced and is GC'd once past the floor.
    """
    import json as _json

    a, b = _mk(cat, spark)
    df_a = spark.createDataFrame([(2, "y")], "k bigint, v string")
    df_b = spark.createDataFrame([(2, 20)], "k bigint, n bigint")

    # (a) stage-only crash
    t = cat.transaction()
    t.append("db.txa", df_a)
    del t  # process died: no claims, no decision
    assert a.read().count() == 1
    a.append(spark.createDataFrame([(10, "post-a")], "k bigint, v string"))

    # (b) prepared-undecided crash
    t = cat.transaction()
    t.append("db.txa", df_a)
    t.append("db.txb", df_b)
    c_b = t._prepare_once()
    dp_b = t.decision_path
    del t
    for loc, v in c_b:
        p = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        os.utime(p, (1, 1))  # past grace
    assert a.read().count() == 2 and b.read().count() == 1  # still old
    resolved = LakeTransaction.resolve_expired(cat.warehouse, grace_sec=60)
    assert os.path.basename(dp_b) in resolved
    assert a.read().count() == 2 and b.read().count() == 1
    b.append(spark.createDataFrame([(11, 110)], "k bigint, n bigint"))

    # (c) committed-before-finalize crash
    t = cat.transaction()
    t.append("db.txa", df_a)
    t.append("db.txb", df_b)
    c_c = t._prepare_once()
    assert M.record_txn_decision(t.decision_path, "committed") == "committed"
    dp_c = t.decision_path
    del t  # died before _finalize
    n_a, n_b = a.read().count(), b.read().count()
    assert (n_a, n_b) == (3, 3)  # visible via the record alone
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=0)
    # markers stripped by the sweep's crashed-committer finalize
    for loc, v in c_c:
        with open(os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")) as f:
            assert _json.load(f)["pending_txn"] is None
    assert a.read().count() == 3 and b.read().count() == 3
    # record now unreferenced: GC'd once past the floor
    os.utime(dp_c, (1, 1))
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=60)
    assert not os.path.exists(dp_c)

    # (d) mid-finalize crash: strip table A's marker by hand, leave B's
    t = cat.transaction()
    t.append("db.txa", df_a)
    t.append("db.txb", df_b)
    c_d = t._prepare_once()
    assert M.record_txn_decision(t.decision_path, "committed") == "committed"
    loc0, v0 = c_d[0]
    p0 = os.path.join(M.metadata_dir(loc0), f"v{v0}.metadata.json")
    with open(p0) as f:
        raw = _json.load(f)
    raw["pending_txn"] = None
    with open(p0 + ".tmp", "w") as f:
        _json.dump(raw, f)
    os.replace(p0 + ".tmp", p0)
    del t  # died with one marker left
    assert a.read().count() == 4 and b.read().count() == 4  # both visible
    LakeTransaction.resolve_expired(cat.warehouse, grace_sec=0)
    for loc, v in c_d:
        with open(os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")) as f:
            assert _json.load(f)["pending_txn"] is None
    # warehouse fully writable at the end of the gauntlet
    a.append(spark.createDataFrame([(99, "fin")], "k bigint, v string"))
    b.append(spark.createDataFrame([(99, 990)], "k bigint, n bigint"))
    assert a.read().count() == 5 and b.read().count() == 5


def test_reversed_commit_is_refused_not_unburned(cat, spark):
    """ADVICE r13 (medium): an owner that pauses past max(grace,
    GC_MIN_AGE) between prepare and decide can find its abort record
    already acted on AND collected — its "committed" link then lands on
    a vacated path. The old behavior un-burned the settled claims
    (finalize stripped the sentinel), returning success for a txn whose
    changes sit BELOW versions other writers committed in the meantime —
    a silent lost commit. The guard must refuse: raise
    TransactionAborted, leave the burned slots burned, tables unchanged
    and writable."""
    import json as _json

    a, b = _mk(cat, spark)
    t = cat.transaction()
    t.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    t.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    claimed = t._prepare_once()
    dp = t.decision_path
    # resolver reaps the expired prepare: abort record, settle, then —
    # past max(grace, GC_MIN_AGE) — the record is GC'd (simulated
    # directly; resolve_expired's sweep does exactly this once every
    # claim is settled and the record is old enough)
    assert M.record_txn_decision(dp, "aborted") == "aborted"
    t._settle(claimed)
    os.unlink(dp)
    # other writers move on: commits land ABOVE the burned slots
    a.append(spark.createDataFrame([(7, "post")], "k bigint, v string"))
    # the paused owner wakes up and decides
    with pytest.raises(TransactionAborted, match="did not take effect"):
        t._decide(claimed)
    # burned slots stay settled (never un-burned), txn rows invisible
    for loc, v in claimed:
        p = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
        with open(p) as f:
            assert _json.load(f)["pending_txn"] == M.ABORTED_SENTINEL
    assert sorted(r["k"] for r in a.read().collect()) == [1, 7]
    assert sorted(r["k"] for r in b.read().collect()) == [1]
    # warehouse stays writable past the burned slots
    b.append(spark.createDataFrame([(8, 80)], "k bigint, n bigint"))
    assert sorted(r["k"] for r in b.read().collect()) == [1, 8]


def test_mixed_settled_claims_raise_reversal_error(cat, spark):
    """A decision record that says committed while only SOME claims are
    settled is unreachable by construction (GC requires every claim
    settled); if it ever occurs the guard must refuse to repair in
    either direction and raise the invariant violation loudly."""
    from tutorial_iceberg_spark.lakehouse.transaction import (
        TransactionReversalError,
        _settle_claim,
    )

    a, b = _mk(cat, spark)
    t = cat.transaction()
    t.append("db.txa", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    t.append("db.txb", spark.createDataFrame([(2, 20)], "k bigint, n bigint"))
    claimed = t._prepare_once()
    # corrupt: settle only the FIRST claim, vacate the record
    loc0, v0 = claimed[0]
    M.record_txn_decision(t.decision_path, "aborted")
    _settle_claim(
        os.path.join(M.metadata_dir(loc0), f"v{v0}.metadata.json"),
        t.decision_path,
    )
    os.unlink(t.decision_path)
    with pytest.raises(TransactionReversalError, match="refusing to repair"):
        t._decide(claimed)
