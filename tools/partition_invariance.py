"""Partitioning-invariance sweep: every oracle-checked query must produce
the IDENTICAL result when its input tables are split into many files.

Why this exists: the driver's correctness gate and the local oracle check
both run on the canonical single-file testdata, which Spark scans as ONE
deterministic partition — so any partition-order-dependent computation
(a raw SUM(double), an unkeyed collect_list fold, a first()-style pick)
can pass every hash check and still be nondeterministic on a real
multi-file / 1000-executor layout. This sweep rewrites each table as
N_FILES parquet parts (round-robin, so every file interleaves the key
space) and compares each query's result on the two layouts as a sorted
multiset with bit-exact float comparison.

Rows-only ops whose outputs are DOCUMENTED as partition-dependent
(per-partition sketches, treeAggregate float partials) are excluded —
their invariants are pytest-gated instead.

Usage: python tools/partition_invariance.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from tutorial_iceberg_spark.io import TABLES, load_table, table_path  # noqa: E402
from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402
from tools.oracle_check import rows_multiset  # noqa: E402

N_FILES = 8

# Outputs documented as partition-dependent by design (constant-memory
# per-partition sketches; float partial sums merged across partitions):
PARTITION_SENSITIVE = {
    "x_topk_sketch",  # Misra-Gries counters live per partition
    "x_stream_heavy_users",  # per-micro-batch MG partials
    "x_embed_pca",  # float64 moment partials, merge order = partitioning
    "x_embed_pq",  # k-means partials, same
    "x_ann_ivf_pq",  # consumes the PQ fit
    "x_ann_ivf_cosine",  # k-means centroid partials
    "x_approx_quantiles",  # engine sketch, merge-order sensitive by spec
    "x_approx_distinct",  # HLL register merge, same
    "s9_rowgroup_stats",  # REPORTS physical row-group layout — the
    # output is the file layout itself, layout-dependent by definition
}


def build_split_copy(spark, sf_dir: str, dest: str) -> None:
    """Rewrite every table as N_FILES round-robin parquet parts."""
    for t in TABLES:
        out = table_path(dest, t)
        load_table(spark, sf_dir, t).repartition(N_FILES).write.mode(
            "overwrite"
        ).parquet(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark(app_name="partition-invariance")
    dest = os.path.join(
        tempfile.gettempdir(), "tis_split", os.path.basename(sf_dir.rstrip("/"))
    )
    build_split_copy(spark, sf_dir, dest)

    specs = all_queries()
    names = [
        n
        for n in specs
        if n not in PARTITION_SENSITIVE
        and (not filters or any(f in n for f in filters))
    ]
    passed, failed, errored = [], [], []
    for name in names:
        spec = specs[name]
        try:
            base_df = spec.builder(spark, sf_dir)
            base = rows_multiset(base_df.collect(), base_df.columns)
            split_df = spec.builder(spark, dest)
            split = rows_multiset(split_df.collect(), split_df.columns)
        except Exception as e:
            errored.append((name, f"{type(e).__name__}: {e}"))
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if base == split:
            passed.append(name)
            print(f"PASS  {name}: {len(base)} rows invariant")
        else:
            diff = [(a, b) for a, b in zip(base, split) if a != b][:2]
            failed.append((name, diff))
            print(
                f"FAIL  {name}: rows {len(base)} vs {len(split)}; "
                f"first diffs {diff}"
            )

    print(
        f"\n== {len(passed)} invariant, {len(failed)} VARIANT, "
        f"{len(errored)} errored, {len(PARTITION_SENSITIVE)} excluded, "
        f"sf_dir={sf_dir} files={N_FILES}"
    )
    shutil.rmtree(dest, ignore_errors=True)
    if failed or errored:
        sys.exit(1)


if __name__ == "__main__":
    main()
