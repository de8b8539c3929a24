"""Full-registry emulation of the driver's pandas-path value hash.

`tools/oracle_check.py` compares via `fetchall()` (plus a HUGEINT type
gate); the driver canonicalizes BOTH sides through pandas, where type
representation differs (HUGEINT -> float64, DATE -> midnight Timestamp,
numpy scalars). `tests/test_driver_pandas_path.py` gates a 12-query
subset in CI; this tool sweeps EVERY oracle-checked query through the
same `DataFrame.toPandas()` vs `rel.df()` comparison so the whole
registry is proven under the driver's exact canonicalization, not just
the sampled subset.

Usage: python tools/pandas_path_sweep.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from tests.test_driver_pandas_path import _canon  # noqa: E402
from tutorial_iceberg_spark.io import TABLES, table_path  # noqa: E402
from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark(app_name="pandas-path-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    specs = all_queries()
    names = [
        n
        for n, s in specs.items()
        if s.oracle is not None and (not filters or any(f in n for f in filters))
    ]
    passed, failed = [], []
    for name in names:
        spec = specs[name]
        try:
            s_pdf = spec.builder(spark, sf_dir).toPandas()
            d_pdf = con.sql(spec.oracle).df()
            problems = []
            if sorted(s_pdf.columns) != sorted(d_pdf.columns):
                problems.append("columns differ")
            else:
                sc, dc = _canon(s_pdf), _canon(d_pdf)
                if len(sc) != len(dc):
                    problems.append(f"rows {len(sc)} vs {len(dc)}")
                else:
                    diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:2]
                    if diffs:
                        problems.append(f"values: {diffs}")
        except Exception as e:
            problems = [f"{type(e).__name__}: {str(e)[:120]}"]
        if problems:
            failed.append((name, problems))
            print(f"FAIL  {name}: {problems}")
        else:
            passed.append(name)
            print(f"PASS  {name}")
    print(f"\n== pandas-path: {len(passed)} passed, {len(failed)} failed, sf_dir={sf_dir}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
