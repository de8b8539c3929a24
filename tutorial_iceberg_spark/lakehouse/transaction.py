"""Multi-table atomic transactions over the lakehouse emulation.

The one ACID property the single-table commit machinery never exercises
(r11 verdict Next #8): N tables committed together or not at all — the
"write the orders batch AND its audit/rollup table" ingest contract a
REST-catalog Iceberg deployment gets from catalog-level transactions
(the reference's catalog week, README.md:1049-1068, stops at single-table
commits; this models the multi-table form those catalogs layer on top).

Protocol — two-phase commit with a single atomic decision record
(presumed abort):

1. STAGE  — each ``txn.append(table, df)`` writes its data files NOW
   (invisible: nothing references them until a metadata commit), exactly
   like a normal append's write phase.
2. PREPARE — at ``commit()``, each table's next version slot is
   CAS-claimed (the same ``os.link`` create-if-absent as every commit)
   with metadata carrying ``pending_txn = <decision path>``. Readers
   treat a prepared version as ABSENT until the decision record says
   committed (metadata._version_visible), and the hint is not flipped.
   A conflict on any table rebases and retries the whole prepare from
   fresh metadata; on exhaustion the txn aborts with every claimed slot
   released — no partial application is possible because nothing is
   visible yet.
3. DECIDE — one ``os.link``-created decision file, first creator wins:
   the committer races any concurrent abort (e.g. an operator reaping an
   expired transaction) to a single name, so exactly one outcome ever
   exists. The instant the record says "committed", EVERY prepared table
   flips visible simultaneously — this is the atomic commit point.
4. FINALIZE (best-effort) — rewrite each prepared version file without
   the pending marker and flip its hint, then remove the decision file.
   A crash anywhere here is harmless: visibility already follows the
   decision record, finalize only makes reads cheaper. The decision file
   is removed only after every marker is gone, so a half-finalized txn
   still resolves correctly.

Crash honesty: a prepared-but-undecided transaction whose process died
holds its version slots (concurrent writers see CommitConflictError until
it is resolved). ``LakeTransaction.resolve_expired`` lets an operator
record an ABORT decision for such a transaction — through the same
first-creator-wins record, so it can never un-commit one that made it.

At 100 TB scale the protocol's costs stay metadata-sized: data files are
written once (stage), prepare/decide are O(tables) tiny-file operations,
and readers pay one extra JSON-header read only while a txn is in flight
on that table.
"""

from __future__ import annotations

import os
import random
import time
import uuid

from pyspark.sql import DataFrame

from . import metadata as M


class TransactionAborted(Exception):
    """The transaction recorded an ABORT decision: no table changed."""


class LakeTransaction:
    """Atomic multi-table commit. Use via ``LakeCatalog.transaction()``:

        with cat.transaction() as txn:
            txn.append("db.orders", orders_batch)
            txn.append("db.ingest_audit", audit_row)
        # exiting the block commits both-or-neither

    One staged operation per table per transaction (a second op on the
    same table raises — the prepare protocol claims one version slot per
    table). Supported op: ``append`` (with the same atomic ``properties``
    merge single-table append offers — the exactly-once sink primitive).
    """

    PREPARE_RETRIES = 10  # same fan-in bound as LakeTable.APPEND_RETRIES

    def __init__(self, catalog):
        self.catalog = catalog
        self.txid = uuid.uuid4().hex
        self.decision_path = os.path.join(
            catalog.warehouse, "_txns", f"{self.txid}.decision"
        )
        # identifier -> (table, aligned files, properties)
        self._ops: dict[str, tuple] = {}
        self._done = False

    # -- staging -----------------------------------------------------------
    def append(
        self,
        identifier: str,
        df: DataFrame,
        properties: dict[str, str] | None = None,
    ) -> None:
        """Stage an append: data files are written immediately (they are
        invisible until the decision record commits them), metadata is
        built at commit() time against fresh table state."""
        if self._done:
            raise RuntimeError("transaction already finished")
        if identifier in self._ops:
            raise ValueError(
                f"table {identifier} already has a staged operation in "
                "this transaction (one per table)"
            )
        t = self.catalog.load_table(identifier)
        md = t.meta
        files = t._write_files(t._align(df, md.schema()), md)
        self._ops[identifier] = (t, files, dict(properties or {}))

    # -- the three phases ----------------------------------------------------
    def _prepare_once(self) -> list[tuple]:
        """CAS-claim every table's next version with pending metadata.
        Returns the prepared (location, version) claims; raises
        CommitConflictError with every claim of THIS attempt released."""
        staged = []
        for t, files, props in self._ops.values():
            md = t.meta  # fresh base: rebases automatically on retry
            cur = md.snapshot()
            base = list(cur.files) if cur else []
            dels = list(cur.delete_files) if cur else []
            for f in files:
                f.manifest_id = 0  # restamp under this attempt's counter
            md.properties.update(props)
            t._new_snapshot(
                md, "append", base + files, dels,
                {"txn": self.txid}, commit=False,
            )
            staged.append((t.location, md))
        claimed = []
        try:
            for location, md in staged:
                M.commit_metadata(location, md, pending_txn=self.decision_path)
                claimed.append((location, md.loaded_version))
        except M.CommitConflictError:
            self._release(claimed)
            raise
        return claimed

    @staticmethod
    def _release(claimed: list[tuple]) -> None:
        """Unlink prepared version files (only ever invisible ones: the
        decision is absent or aborted, so no reader resolved them)."""
        for location, v in claimed:
            try:
                os.unlink(
                    os.path.join(M.metadata_dir(location), f"v{v}.metadata.json")
                )
            except FileNotFoundError:
                pass

    def _finalize(self, claimed: list[tuple]) -> None:
        """Strip pending markers + flip hints, then drop the decision
        record (safe only once NO version file references it). Each
        claimed version FILE is rewritten directly (not via a current-
        state read): a writer may already have committed versions above
        ours, and the marker must still come off OUR file — a dangling
        marker pointing at a deleted decision record would read as
        in-flight forever."""
        import json

        for location, v in claimed:
            mdir = M.metadata_dir(location)
            vpath = os.path.join(mdir, f"v{v}.metadata.json")
            with open(vpath) as f:
                raw = json.load(f)
            if raw.get("pending_txn") == self.decision_path:
                raw["pending_txn"] = None
                tmp = os.path.join(mdir, f".fin-{uuid.uuid4().hex}.json")
                with open(tmp, "w") as f:
                    json.dump(raw, f, indent=1)
                os.replace(tmp, vpath)  # same state, marker gone — atomic
            # advisory hint: probing only goes UP from it, so pointing at
            # v is sound even if later versions already exist
            M.flip_hint(location, v)
        try:
            os.unlink(self.decision_path)
        except FileNotFoundError:
            pass

    def commit(self) -> None:
        """PREPARE all tables (rebase-retry on single-table conflicts),
        DECIDE through the first-creator-wins record, FINALIZE. After
        this returns, every staged table shows its new state; if it
        raises TransactionAborted, none does."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._ops:
            return
        claimed: list[tuple] = []
        last_err: Exception | None = None
        for attempt in range(self.PREPARE_RETRIES):
            try:
                claimed = self._prepare_once()
                break
            except M.CommitConflictError as e:
                last_err = e
                # Jittered exponential backoff before re-preparing.
                # Unlike a single-slot append (where a conflict proves
                # another writer COMMITTED — lock-free progress), a
                # multi-table prepare can conflict against another
                # txn's since-released claim: two txns claiming the
                # same tables in opposite orders release and retry in
                # lockstep, a livelock only timing luck breaks.
                # Measured by tools/txn_probe.py at a 16-way
                # simultaneous-commit herd: immediate retries exhausted
                # for 30/64 txns; randomized waits break the symmetry.
                time.sleep(
                    min(0.02 * (2 ** attempt), 0.5)
                    * (0.5 + random.random())
                )
        else:
            M.record_txn_decision(self.decision_path, "aborted")
            raise TransactionAborted(
                f"txn {self.txid}: prepare exhausted retries"
            ) from last_err
        decision = M.record_txn_decision(self.decision_path, "committed")
        if decision != "committed":
            # a resolver recorded abort first (expired-txn reaping race):
            # our prepares are invisible forever — release the slots
            self._release(claimed)
            raise TransactionAborted(
                f"txn {self.txid}: decision record says {decision!r}"
            )
        self._finalize(claimed)

    def abort(self) -> None:
        """Record an abort (if the decision is still open) and release
        any claims. Staged data files become unreferenced orphans for the
        scratch reaper — same as any failed single-table write."""
        if self._done:
            return
        self._done = True
        if self._ops:
            M.record_txn_decision(self.decision_path, "aborted")

    # -- operator recovery ---------------------------------------------------
    @staticmethod
    def resolve_expired(
        warehouse: str, grace_sec: float = 3600.0
    ) -> list[str]:
        """Record ABORT for in-flight transactions older than
        ``grace_sec`` (mtime of any prepared version file naming an
        undecided record), then release the aborted prepares' version
        slots so their tables are writable again. First-creator-wins
        makes the abort safe against the original committer: whichever
        decision lands first stands, so a live slow committer either wins
        the race (this abort loses and resolves nothing) or observes
        "aborted" and rolls back. A COMMITTED decision is never touched —
        resolve can never un-commit.

        Also garbage-collects ABORTED decision records past ``grace_sec``
        that no prepared version file references anymore. (COMMITTED
        records are removed by the owner's finalize; aborted ones persist
        as the durable outcome — in this protocol an ABSENT record means
        in-flight, not abort, so a record may only go once nothing can
        consult it again. A record still referenced by a crashed owner's
        un-released claim survives this sweep; the same walk unlinks that
        claim, so the NEXT sweep collects the record.)"""
        import json

        resolved = []
        referenced: set[str] = set()
        now = time.time()
        # undecided = no decision file exists; find candidates from
        # prepared version files across the warehouse
        for root, _dirs, names in os.walk(warehouse):
            if os.path.basename(root) != "metadata":
                continue
            for n in names:
                if not n.endswith(".metadata.json"):
                    continue
                p = os.path.join(root, n)
                try:
                    with open(p) as f:
                        pending = json.load(f).get("pending_txn")
                except (OSError, ValueError):
                    continue
                if not pending:
                    continue
                referenced.add(pending)
                decision = M.txn_decision(pending)
                if decision is None:
                    try:
                        age = now - os.path.getmtime(p)
                    except OSError:
                        # the owning txn released this claim between our
                        # open() and here (prepare-conflict _release):
                        # nothing left to resolve
                        continue
                    if age < grace_sec:
                        continue  # live transaction: leave it alone
                    decision = M.record_txn_decision(pending, "aborted")
                    if decision == "aborted":
                        resolved.append(os.path.basename(pending))
                if decision == "aborted":
                    # invisible forever: releasing the slot is safe (the
                    # owning txn's own _release tolerates the miss)
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
        txns_dir = os.path.join(warehouse, "_txns")
        try:
            records = os.listdir(txns_dir)
        except FileNotFoundError:
            records = []
        for n in records:
            if not n.endswith(".decision"):
                continue  # a racing writer's .tmp-* link source: not ours
            dp = os.path.join(txns_dir, n)
            if dp in referenced or M.txn_decision(dp) != "aborted":
                continue
            try:
                if now - os.path.getmtime(dp) >= grace_sec:
                    os.unlink(dp)
            except OSError:
                pass  # swept by a racing resolver: same outcome
        return sorted(set(resolved))

    # -- context manager -------------------------------------------------
    def __enter__(self) -> "LakeTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.commit()
        else:
            self.abort()
