"""Z-order clustering effectiveness probe at inflated scale.

``LakeTable.compact(zorder_by=[a, b])`` claims what Iceberg's
rewrite_data_files(strategy=>'sort', sort_order=>'zorder(a,b)') claims:
after reclustering, file-level min/max stats become selective on EVERY
Z dimension, so multi-dimensional point/box scans prune most of the
table's files — where a lexicographic sort is selective only on its
leading column. tests/test_lakehouse.py proves the direction at 400
rows; this probe measures the magnitude at 100x bench scale (orders
sf0.1 inflated 100x = 15M rows, 64 files per layout), which is where
file pruning starts to matter (a 1000-executor scan's planning and IO
are both proportional to surviving files).

Three layouts of the SAME 15M rows, all compacted to the same file
count (so candidate-file counts are comparable):

- unsorted   — compact(target_files=64), no sort: every file spans the
               full key range on both dims; nothing should prune.
- linear     — compact(sort_by=[o_custkey]): leading-dim scans prune to
               ~selectivity x files; trailing-dim scans cannot prune.
- zorder     — compact(zorder_by=[o_custkey, o_orderkey]): BOTH dims
               prune (each to ~sqrt-ish tiles of the Z curve).

Measured per layout x predicate: candidate files after manifest+file
stats pruning (`_candidates` — the same path `scan()` uses), scanned
fraction, scan wall (best-of-2), and row-count equality against the
unpruned filter (pruning must never change results).

Usage:  python tools/zorder_probe.py [base_sf_dir] [factor] [files]
Defaults: /root/testdata/sf0.1  100  64. Emits one JSON line per
(layout, predicate) plus a summary; narrative in SCALE_PROBE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from tutorial_iceberg_spark.session import get_spark  # noqa: E402
from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog  # noqa: E402

DDL = "o_orderkey bigint, o_custkey bigint, o_totalprice double"

# ~1%-wide ranges on each dimension (custkey spans 0..15e3, orderkey
# spans 0..15e6 after 100x inflation)
PREDICATES = {
    "leading_dim": "o_custkey >= 7000 AND o_custkey < 7150",
    "trailing_dim": "o_orderkey >= 7000000 AND o_orderkey < 7150000",
    "box_2d": (
        "o_custkey >= 7000 AND o_custkey < 8500 "
        "AND o_orderkey >= 7000000 AND o_orderkey < 8500000"
    ),
}


def build_source(spark, base_dir: str, factor: int):
    orders = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    n_base = orders.count()
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .crossJoin(F.broadcast(copies))
        .select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(n_base)).alias(
                "o_orderkey"
            ),
            "o_custkey",
            "o_totalprice",
        )
    ), n_base * factor


def probe_layout(spark, cat, name: str, src, n_files: int, **compact_kw):
    t = cat.create_table(f"db.z_{name}", DDL)
    t.append(src)
    t.compact(target_files=n_files, **compact_kw)
    md = t.meta
    snap = md.snapshot()
    total = len(snap.files)
    rows = []
    for pname, pred in PREDICATES.items():
        cands = t._candidates(md, snap, pred)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_match = t.scan(pred).count()
            walls.append(time.perf_counter() - t0)
        # pruning is best-effort, never load-bearing: the unpruned
        # filtered read must agree row-for-row
        n_full = t.read().filter(F.expr(pred)).count()
        rows.append(
            {
                "layout": name,
                "predicate": pname,
                "files_total": total,
                "files_scanned": len(cands),
                "scan_fraction": round(len(cands) / total, 3),
                "rows": n_match,
                "rows_match_unpruned": n_match == n_full,
                "scan_wall_s": round(min(walls), 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> None:
    args = sys.argv[1:]
    base_dir = args[0] if args else "/root/testdata/sf0.1"
    factor = int(args[1]) if len(args) > 1 else 100
    n_files = int(args[2]) if len(args) > 2 else 64

    spark = get_spark(app_name="zorder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as wh:
        cat = LakeCatalog(spark, wh)
        src, n_rows = build_source(spark, base_dir, factor)
        src = src.cache()
        print(
            json.dumps(
                {"probe": "zorder", "rows": n_rows, "factor": factor,
                 "target_files": n_files}
            ),
            flush=True,
        )
        all_rows = []
        all_rows += probe_layout(spark, cat, "unsorted", src, n_files)
        all_rows += probe_layout(
            spark, cat, "linear", src, n_files, sort_by=["o_custkey"]
        )
        all_rows += probe_layout(
            spark, cat, "zorder", src, n_files,
            zorder_by=["o_custkey", "o_orderkey"],
        )
        ok = all(r["rows_match_unpruned"] for r in all_rows)
        by = {
            (r["layout"], r["predicate"]): r["scan_fraction"]
            for r in all_rows
        }
        print(
            json.dumps(
                {
                    "summary": "zorder-effectiveness",
                    "all_rows_match": ok,
                    "scan_fraction": {
                        f"{l}/{p}": v for (l, p), v in by.items()
                    },
                }
            ),
            flush=True,
        )
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
