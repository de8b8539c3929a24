"""Multi-table transaction contention probe.

The 2PC design notes (lakehouse/transaction.py) claim the protocol's
costs stay METADATA-SIZED at any data scale: stage writes data once,
prepare/decide are O(tables) tiny-file operations, and contention is
resolved by rebase-retry on the claimed version slots. This probe
measures that claim instead of asserting it:

- C committer threads each stage a 2-table transaction (data files
  written up front — the part that scales with data, not with
  contention), then meet at a barrier and call ``commit()``
  SIMULTANEOUSLY — the worst-case thundering herd on the same two
  version-slot sequences.
- Measured per contention level: commit() latency (the pure metadata
  2PC: prepare CAS + decision link + finalize), CAS conflicts observed
  (counted via an instrumented commit_metadata), commit/abort split,
  and the end-state invariant (committed txids identical in BOTH
  tables — the probe refuses to report numbers from a run that broke
  atomicity).

A ZERO-GRACE REAPER thread runs ``resolve_expired(grace_sec=0)`` in a
loop for the whole probe (r12 lesson: the quiet-host probe missed a
resolver/committer TOCTOU the loaded stress test caught) — every
prepare is instantly abort-eligible, so the decide race and the
burned-slot machinery are exercised at every contention level, and the
atomicity check below would catch a split txn or a destroyed claim.

Usage:
    python tools/txn_probe.py [levels ...]              # default 1 2 4 8 16
    python tools/txn_probe.py --grace 0.25 [levels ...] # reaper grace (s)

Two readings per run shape: grace=0 is the ATOMICITY gauntlet (every
prepare is instantly abort-eligible — commits lost to the reaper's
first-creator-wins race are the probe's own harshness, not a protocol
defect; the binding assert is atomic_ok). A small nonzero grace (e.g.
0.25 s, still far below any real deployment's hours) measures LIVENESS:
healthy sub-grace commit windows decide unmolested while stalled
prepares still get reaped. r14 note: metadata sharding shrank version
files ~100x, which made the zero-grace reaper's walk near-instant and
turned low-contention levels into coin flips it now usually wins —
hence the explicit grace axis.

Emits one JSON line per level plus a summary line; the narrative lives
in SCALE_PROBE.md. Run on a quiet host — latencies are wall-clock.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from tutorial_iceberg_spark.session import get_spark  # noqa: E402
from tutorial_iceberg_spark.lakehouse import metadata as M  # noqa: E402
from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog  # noqa: E402
from tutorial_iceberg_spark.lakehouse.transaction import (  # noqa: E402
    LakeTransaction,
    TransactionAborted,
)

ROUNDS_PER_LEVEL = 4  # each thread commits this many txns per level


class ConflictCounter:
    """Wrap metadata.commit_metadata to count CAS losses (probe-side
    instrumentation only — the engine stays untouched)."""

    def __init__(self):
        self.conflicts = 0
        self._lock = threading.Lock()
        self._orig = M.commit_metadata

    def __enter__(self):
        def counting(location, md, pending_txn=None):
            try:
                return self._orig(location, md, pending_txn=pending_txn)
            except M.CommitConflictError:
                with self._lock:
                    self.conflicts += 1
                raise

        M.commit_metadata = counting
        return self

    def __exit__(self, *exc):
        M.commit_metadata = self._orig


def probe_level(spark, threads: int, grace: float = 0.0) -> dict:
    with tempfile.TemporaryDirectory() as wh:
        cat = LakeCatalog(spark, wh)
        a = cat.create_table("db.pa", "k bigint, tag string")
        b = cat.create_table("db.pb", "k bigint, tag string")

        outcomes: dict[str, str] = {}
        latencies: list[float] = []
        lock = threading.Lock()
        t_wall0 = time.perf_counter()

        reap_stop = threading.Event()
        reaper_errors: list[Exception] = []

        def reaper() -> None:
            # harshest operator behavior: every prepare is instantly
            # abort-eligible; must never crash and never split a txn
            while not reap_stop.is_set():
                try:
                    LakeTransaction.resolve_expired(wh, grace_sec=grace)
                except Exception as e:  # pragma: no cover - probe detail
                    reaper_errors.append(e)
                    return

        reap_th = threading.Thread(target=reaper)
        reap_th.start()

        with ConflictCounter() as cc:
            for rnd in range(ROUNDS_PER_LEVEL):
                barrier = threading.Barrier(threads)
                txns = []
                # STAGE serially-per-thread first (Spark-bound, data-
                # sized); only commit() is measured under the barrier
                def stage_and_commit(i: int) -> None:
                    txn = cat.transaction()
                    df = spark.createDataFrame(
                        [(i, f"r{rnd}-t{i}-{txn.txid[:8]}")],
                        "k bigint, tag string",
                    )
                    txn.append("db.pa", df)
                    txn.append("db.pb", df)
                    barrier.wait(timeout=300)  # a dead sibling must not hang the probe
                    t0 = time.perf_counter()
                    try:
                        txn.commit()
                        out = "committed"
                    except TransactionAborted:
                        out = "aborted"
                    dt = time.perf_counter() - t0
                    with lock:
                        outcomes[txn.txid] = out
                        latencies.append(dt)

                ths = [
                    threading.Thread(target=stage_and_commit, args=(i,))
                    for i in range(threads)
                ]
                for th in ths:
                    th.start()
                for th in ths:
                    th.join()
        reap_stop.set()
        reap_th.join()
        wall = time.perf_counter() - t_wall0
        if reaper_errors:
            raise RuntimeError(f"reaper crashed mid-probe: {reaper_errors!r}")

        committed = {t for t, o in outcomes.items() if o == "committed"}
        in_a = {
            s.summary["txn"] for s in a.meta.snapshots if s.summary.get("txn")
        }
        in_b = {
            s.summary["txn"] for s in b.meta.snapshots if s.summary.get("txn")
        }
        atomic_ok = in_a == committed and in_b == committed
        rows_a = a.read().count()
        rows_b = b.read().count()
        lat_ms = sorted(x * 1000 for x in latencies)
        return {
            "threads": threads,
            "txns": len(outcomes),
            "committed": len(committed),
            "aborted": len(outcomes) - len(committed),
            "cas_conflicts": cc.conflicts,
            "commit_ms_p50": round(lat_ms[len(lat_ms) // 2], 2),
            "commit_ms_max": round(lat_ms[-1], 2),
            "wall_s": round(wall, 2),
            "atomic_ok": atomic_ok,
            "rows_match": rows_a == rows_b == len(committed),
        }


def main() -> None:
    args = sys.argv[1:]
    grace = 0.0
    if "--grace" in args:
        i = args.index("--grace")
        grace = float(args[i + 1])
        del args[i : i + 2]
    levels = [int(x) for x in args] or [1, 2, 4, 8, 16]
    spark = get_spark(app_name="txn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for lv in levels:
        row = probe_level(spark, lv, grace)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if not (row["atomic_ok"] and row["rows_match"]):
            print(json.dumps({"summary": "ATOMICITY VIOLATION — see row"}))
            sys.exit(1)
    print(
        json.dumps(
            {
                "summary": "txn-contention",
                "levels": levels,
                "reaper_grace_s": grace,
                "total_txns": sum(r["txns"] for r in rows),
                "total_committed": sum(r["committed"] for r in rows),
                "all_atomic": all(r["atomic_ok"] for r in rows),
            }
        )
    )


if __name__ == "__main__":
    main()
