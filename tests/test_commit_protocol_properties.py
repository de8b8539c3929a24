"""Property-based gates for the burned-slot commit protocol (hypothesis).

The r13 redesign's correctness rests on a handful of metadata-layer
invariants that hold under ANY interleaving of commits, prepares,
decisions, settles, and sweeps — not just the interleavings the unit
tests step through. This file drives randomized operation sequences
against a plain-Python reference model (no Spark: the protocol is pure
metadata, so thousands of cases run in seconds) and asserts:

- I1 (visibility): current_version resolves exactly the model's highest
  COMMITTED version — burned/pending slots are never read as state.
- I2 (monotone reads): a table's resolved version never goes backwards.
- I3 (no reuse): a burned version file is never unlinked and its
  content's identity never changes to another transaction's.
- I4 (writer progress): after any sequence, a fresh plain commit always
  succeeds and becomes the resolved state (no stuck warehouse).
- I5 (decision stability): a decision record's content never flips.
"""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tutorial_iceberg_spark.lakehouse import metadata as M

# op grammar: each entry drives one protocol action against one of two
# in-flight txn slots ("t0"/"t1"), or the plain single-writer path
OPS = st.lists(
    st.sampled_from(
        [
            "plain_commit",
            "prepare_t0",
            "prepare_t1",
            "decide_commit_t0",
            "decide_commit_t1",
            "decide_abort_t0",
            "decide_abort_t1",
            "finalize_t0",
            "finalize_t1",
            "settle_t0",
            "settle_t1",
        ]
    ),
    min_size=1,
    max_size=24,
)


def _mk_table(root: str) -> str:
    loc = os.path.join(root, "db", "t")
    md = M.new_table_metadata("db.t", loc, [M.Field(id=1, name="k", type="bigint")])
    M.commit_metadata(loc, md)
    return loc


class _Txn:
    """One prepared slot in the model: (version, decision_path, state)."""

    def __init__(self, root: str, name: str):
        self.decision_path = os.path.join(root, "_txns", f"{name}.decision")
        self.version: int | None = None  # claimed slot
        self.finalized = False


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=OPS)
def test_commit_protocol_invariants(ops: list[str]) -> None:
    with tempfile.TemporaryDirectory() as root:
        loc = _mk_table(root)
        # model state
        committed_top = 1  # v1 = create
        seen_reads: list[int] = []
        burned: dict[int, str] = {}  # version -> owning decision path
        decisions: dict[str, str] = {}  # path -> recorded outcome
        txns: dict[str, _Txn] = {}

        def check_read():
            v = M.current_version(loc)
            # I1: exactly the model's committed top
            assert v == committed_top, (v, committed_top, ops)
            # I2: monotone
            if seen_reads:
                assert v >= seen_reads[-1]
            seen_reads.append(v)

        def fresh_txn(name: str) -> _Txn:
            t = txns.get(name)
            if t is None or t.version is None or t.finalized:
                t = _Txn(root, f"{name}-{len(seen_reads)}-{len(txns)}")
                txns[name] = t
            return t

        for op in ops:
            if op == "plain_commit":
                md = M.read_metadata(loc)
                try:
                    v = M.commit_metadata(loc, md)
                except M.CommitConflictError:
                    # only legal while an UNDECIDED prepare blocks the slot
                    blocking = [
                        t
                        for t in txns.values()
                        if t.version is not None
                        and M.txn_decision(t.decision_path) is None
                    ]
                    assert blocking, f"conflict with no undecided prepare: {ops}"
                    continue
                assert v > committed_top and v not in burned
                committed_top = v
            elif op.startswith("prepare_"):
                name = op.split("_")[1]
                t = txns.get(name)
                if t is not None and t.version is not None and not t.finalized:
                    continue  # one claim per txn slot
                t = fresh_txn(name)
                md = M.read_metadata(loc)
                try:
                    M.commit_metadata(loc, md, pending_txn=t.decision_path)
                except M.CommitConflictError:
                    blocking = [
                        x
                        for x in txns.values()
                        if x is not t
                        and x.version is not None
                        and M.txn_decision(x.decision_path) is None
                    ]
                    assert blocking, f"prepare conflict unexplained: {ops}"
                    continue
                t.version = md.loaded_version
                assert t.version > committed_top
            elif op.startswith("decide_"):
                _, outcome, name = op.split("_")
                t = txns.get(name)
                if t is None or t.version is None:
                    continue
                want = "committed" if outcome == "commit" else "aborted"
                got = M.record_txn_decision(t.decision_path, want)
                prior = decisions.get(t.decision_path)
                if prior is not None:
                    # I5: first creator wins, forever
                    assert got == prior
                decisions[t.decision_path] = got
                if got == "committed":
                    committed_top = max(committed_top, t.version)
                else:
                    burned[t.version] = t.decision_path
            elif op.startswith("finalize_"):
                name = op.split("_")[1]
                t = txns.get(name)
                if (
                    t is None
                    or t.version is None
                    or decisions.get(t.decision_path) != "committed"
                    or t.finalized
                ):
                    continue
                # owner's finalize: strip the marker in place
                vp = os.path.join(
                    M.metadata_dir(loc), f"v{t.version}.metadata.json"
                )
                with open(vp) as f:
                    raw = json.load(f)
                if raw.get("pending_txn") == t.decision_path:
                    raw["pending_txn"] = None
                    with open(vp + ".tmp", "w") as f:
                        json.dump(raw, f)
                    os.replace(vp + ".tmp", vp)
                M.flip_hint(loc, t.version)
                t.finalized = True
            elif op.startswith("settle_"):
                name = op.split("_")[1]
                t = txns.get(name)
                if (
                    t is None
                    or t.version is None
                    or decisions.get(t.decision_path) != "aborted"
                ):
                    continue
                from tutorial_iceberg_spark.lakehouse.transaction import (
                    _settle_claim,
                )

                _settle_claim(
                    os.path.join(
                        M.metadata_dir(loc), f"v{t.version}.metadata.json"
                    ),
                    t.decision_path,
                )
            check_read()
            # I3: every burned file still exists, still invisible
            for v, dp in burned.items():
                vp = os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json")
                assert os.path.exists(vp)
                with open(vp) as f:
                    pend = json.load(f).get("pending_txn")
                assert pend in (dp, M.ABORTED_SENTINEL)

        # I4: the warehouse is never stuck — resolve any undecided
        # prepares (the operator path), then a plain commit always lands
        from tutorial_iceberg_spark.lakehouse.transaction import (
            LakeTransaction,
        )

        for t in txns.values():
            if t.version is not None:
                p = os.path.join(
                    M.metadata_dir(loc), f"v{t.version}.metadata.json"
                )
                if os.path.exists(p):
                    os.utime(p, (1, 1))
        LakeTransaction.resolve_expired(root, grace_sec=60)
        for t in txns.values():
            if t.version is not None and decisions.get(t.decision_path) != "committed":
                burned.setdefault(t.version, t.decision_path)
        md = M.read_metadata(loc)
        v = M.commit_metadata(loc, md)
        assert v > committed_top and v not in burned
        assert M.current_version(loc) == v
