"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, sorted column names, and an
order-insensitive value multiset with BIT-EXACT float comparison (stricter
than any plausible driver hash).

Usage: python tools/oracle_check.py [--layout=8part] [sf_dir] [name_filter ...]

``--layout=8part`` (VERDICT r8 Next #5): rewrites every table as 8
round-robin parquet parts and runs the WHOLE gate — Spark queries AND
DuckDB oracles — against that multi-file layout. The single-file fixture
scans as one deterministic partition, which historically hid 4 real
partition-order bugs (raw double sums, unkeyed folds); promoting the
split layout into the oracle gate makes every hash comparison exercise
the multi-file scan path a real table has. Queries whose OUTPUT is the
physical layout itself (s9_rowgroup_stats) are skipped in this mode.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

from tutorial_iceberg_spark.io import TABLES, table_path  # noqa: E402
from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402

# oracled queries whose result is the single-file physical layout itself
LAYOUT_DEPENDENT = {"s9_rowgroup_stats"}


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v.hex()}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def rows_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    layout = "single"
    if args and args[0].startswith("--layout="):
        layout = args[0].split("=", 1)[1]
        args = args[1:]
    if layout not in ("single", "8part"):
        sys.exit(f"unknown --layout={layout} (single|8part)")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]

    spark = get_spark(app_name="oracle-check")
    if layout == "8part":
        from tools.partition_invariance import build_split_copy
        import tempfile

        dest = os.path.join(
            tempfile.gettempdir(),
            "tis_oracle_8part",
            os.path.basename(sf_dir.rstrip("/")),
        )
        build_split_copy(spark, sf_dir, dest)
        print(f"# 8part layout: {sf_dir} -> {dest}")
        sf_dir = dest
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    specs = all_queries()
    names = [n for n in specs if not filters or any(f in n for f in filters)]
    if layout == "8part":
        skipped = [n for n in names if n in LAYOUT_DEPENDENT]
        names = [n for n in names if n not in LAYOUT_DEPENDENT]
        for n in skipped:
            print(f"SKIP  {n}: output IS the physical layout (8part mode)")
    passed, failed, rows_only = [], [], []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.builder(spark, sf_dir)
            s_rows = df.collect()
            s_cols = df.columns
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        t_spark = time.time() - t0
        if spec.oracle is None:
            rows_only.append(name)
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        t1 = time.time()
        try:
            rel = con.sql(spec.oracle)
            d_cols = [c for c in rel.columns]
            # The driver canonicalizes through pandas: DuckDB HUGEINT
            # becomes float64 there and its value hash then compares e.g.
            # 5.0 against Spark's 5 (the r6 x_semantic_dedup_corpus
            # failure). fetchall() converts HUGEINT to Python int and
            # hides that divergence, so gate on the planned types too —
            # this makes the local check subsume the driver's
            # canonicalization for type-level drift.
            d_types = [str(t).upper() for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        t_duck = time.time() - t1

        problems = []
        huge = [
            c for c, t in zip(d_cols, d_types) if "HUGEINT" in t
        ]
        if huge:
            problems.append(
                f"oracle types HUGEINT (pandas->float64 under the driver "
                f"hash) on columns {huge}: add CAST(... AS BIGINT)"
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            sm, dm = rows_multiset(s_rows, s_cols), rows_multiset(d_rows, d_cols)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            # spark vs oracle time split: a slow line can be the DuckDB
            # oracle (e.g. the recursive-CTE CC check), not the engine
            print(
                f"PASS  {name}: {len(s_rows)} rows "
                f"[{t_spark:.1f}s spark + {t_duck:.1f}s oracle]"
            )

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only, sf_dir={sf_dir}, layout={layout}"
    )
    if failed:
        print("failures:")
        for n, p in failed:
            print(f"  {n}: {p[:400]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
