"""Partition-clustered manifest-merge probe (r14 verdict Next #2).

Ordinary appends pack manifests by arrival; pre-r15 the commit-time
merge step ALSO packed by arrival, so after K interleaved-partition
appends every merged manifest's partition summary spanned all
partitions and summary pruning recovered only after an explicit
``rewrite_manifests``. r15 clusters the merge step's output groups by
partition value, so pruning must hold WITHOUT maintenance.

The probe: 50 metadata-only single-partition appends, round-robin over
8 identity partitions (the hive-style hourly-ingest pattern), on the
REAL commit path (LakeTable._new_snapshot + _carried_plus). It records
``plan_manifests("p = 3")`` — (manifests touched, total) — after the
appends and again after ``rewrite_manifests``: the two touched counts
must be ~equal (within the few still-unmerged fresh manifests), where
pre-clustering the first number was every merged manifest.

Usage: python tools/cluster_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tutorial_iceberg_spark.lakehouse import metadata as M  # noqa: E402
from tutorial_iceberg_spark.lakehouse.table import LakeTable  # noqa: E402

PARTS = 8
APPENDS = 50
BATCH = 40


def _mk_partitioned(wh: str) -> str:
    loc = os.path.join(wh, "db", "clust")
    md = M.new_table_metadata(
        "clust", loc, [M.Field(1, "k", "bigint"), M.Field(2, "p", "bigint")]
    )
    md.partition_specs = [
        M.PartitionSpec(
            spec_id=0,
            fields=[
                M.PartitionField(
                    source="p", source_id=2, transform="identity", name="p"
                )
            ],
        )
    ]
    M.commit_metadata(loc, md)
    return loc


def _append_one_partition(t: LakeTable, loc: str, pi: int, start: int) -> None:
    md = M.read_metadata(loc)
    cur = md.snapshot()
    new = [
        M.DataFile(
            path=f"data/p={pi}/{start + i:08d}.parquet",
            rows=1000,
            bytes=64_000_000,
            schema_id=md.current_schema_id,
            spec_id=md.current_spec_id,
            partition={"p": str(pi)},
            stats={"k": [str(start + i), str(start + i + 999)]},
        )
        for i in range(BATCH)
    ]
    t._new_snapshot(md, "append", t._carried_plus(md, cur, new))


def main() -> None:
    from tutorial_iceberg_spark.lakehouse import transforms as T

    def _entries_touched(t: LakeTable, pred: str) -> tuple[int, int]:
        """Planning ENTRY IO: entries inside manifests the summary
        check cannot prune — the cost metric manifest COUNT hides
        (one arrival-order mega-manifest is 1 touched manifest but
        ~BATCH*16 parsed entries)."""
        md = M.read_metadata(t.location)
        snap = md.snapshot()
        recs = t._snapshot_manifest_recs(md, snap)
        conj = T.parse_conjuncts(pred)
        touched = sum(
            r["count"]
            for r in recs.values()
            if t._summary_may_match(md, r["summary"], conj)
        )
        return touched, sum(r["count"] for r in recs.values())

    with tempfile.TemporaryDirectory() as wh:
        loc = _mk_partitioned(wh)
        t = LakeTable.__new__(LakeTable)
        t.spark = None
        t.location = loc
        for i in range(APPENDS):
            _append_one_partition(t, loc, i % PARTS, i * BATCH)
        touched_appends, total_appends = t.plan_manifests("p = 3")
        ent_touched, ent_total = _entries_touched(t, "p = 3")
        t.rewrite_manifests(target_manifests=PARTS)
        touched_rewrite, total_rewrite = t.plan_manifests("p = 3")
        result = {
            "probe": "cluster_probe",
            "appends": APPENDS,
            "partitions": PARTS,
            "entries": APPENDS * BATCH,
            "after_appends": {
                "touched": touched_appends,
                "total": total_appends,
            },
            "after_rewrite_manifests": {
                "touched": touched_rewrite,
                "total": total_rewrite,
            },
            # the headline: merge-time clustering keeps plan-time
            # pruning within a few fresh (not-yet-merged) manifests of
            # the fully-maintained layout
            "touched_gap_vs_maintained": touched_appends - touched_rewrite,
            "pruned_fraction_after_appends": round(
                1 - touched_appends / total_appends, 3
            ),
            # planning ENTRY IO without maintenance (the metric that
            # exposes arrival-order mega-manifests): ideal floor is
            # entries_total / PARTS
            "entries_parsed_by_pruned_scan": ent_touched,
            "entries_total": ent_total,
            # A/B vs the r14 tip (same scenario run against the
            # .bench_prev checkout c08b8ef, whose merge packed by
            # arrival): 4/20 manifests touched but 1360/2000 ENTRIES
            # parsed — the clustered merge cuts planning entry IO 5.7x
            # to the per-partition floor
            "r14_arrival_order_baseline": {
                "manifests_touched": 4,
                "manifests_total": 20,
                "entries_parsed_by_pruned_scan": 1360,
                "entries_total": 2000,
            },
        }
        text = json.dumps(result, indent=1)
        print(text)
        if len(sys.argv) > 1:
            with open(sys.argv[1], "w") as f:
                f.write(text)


if __name__ == "__main__":
    main()
