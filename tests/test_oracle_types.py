"""Registry-wide oracle type hygiene gate.

The driver's correctness check canonicalizes both the Spark result and the
DuckDB oracle result through pandas before hashing. DuckDB types an uncast
integer ``SUM(...)`` as HUGEINT, which pandas converts to float64 — so the
driver hashes ``5.0`` against Spark's ``5`` and fails even though the values
are equal (the round-6 ``x_semantic_dedup_corpus`` driver failure). This gate
walks every registered oracle and asserts no output column plans as
HUGEINT/UHUGEINT. ``rel.types`` is planning-only, so the whole sweep costs
seconds and no data scan.
"""

from __future__ import annotations

import duckdb
import pytest

from tutorial_iceberg_spark.io import TABLES, table_path
from tutorial_iceberg_spark.registry import all_queries


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


# Every type here has appeared in at least one driver-green (hash_match)
# sampled query across rounds 1-6, so its pandas canonicalization is proven
# to agree with Spark's. Anything outside the list is a latent coin-flip:
# HUGEINT broke (-> float64), DATE was never sampled (DuckDB .df() yields
# a midnight Timestamp while Spark yields datetime.date). Normalize new
# queries' outputs to these types, or prove the new type green first.
PROVEN_TYPES = {"BIGINT", "DOUBLE", "INTEGER", "TIMESTAMP", "TINYINT", "VARCHAR"}


def test_oracle_output_types_are_driver_proven(duck):
    offenders = {}
    n_oracles = 0
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        n_oracles += 1
        rel = duck.sql(spec.oracle)
        bad = [
            (c, str(t).upper())
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() not in PROVEN_TYPES
        ]
        if bad:
            offenders[name] = bad
    assert n_oracles > 0
    assert not offenders, (
        "oracle output columns type outside the driver-proven allowlist "
        "(HUGEINT hashes as float64; DATE hashes as midnight Timestamp "
        "on the DuckDB side only): CAST to a proven type — "
        f"{offenders}"
    )
