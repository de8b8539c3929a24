"""Pin the cross-engine token-count idiom on edge inputs (VERDICT r6 #4).

~8 oracles count tokens as ``len(string_split_regex(trim(x), '\\s+'))``
against Spark's ``F.size(F.split(F.trim(x), '\\s+'))``. Both agree today —
including the non-obvious edges: empty string counts 1 (split of '' yields
['']), space-only trims to '' and counts 1, but tab/newline-only counts 2
because BOTH engines' trim strips ASCII space only. Those equalities have
version history in both engines; this differential fixture catches drift
at commit time instead of in the driver's hash.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

EDGE_TEXTS = [
    "",
    " ",
    "   ",
    "\t",
    "\n",
    "\t\n ",
    "   ",  # NBSP: not \s-matched the same as space in some regex dialects
    "a",
    " a ",
    " a  b ",
    "a b c",
    "a\tb\nc",
    "word " * 50,
]


def test_token_idiom_agrees_on_edge_inputs(spark):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, text string"
    ).select("i", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ntok"))
    got_spark = {r["i"]: r["ntok"] for r in sdf.collect()}

    con = duckdb.connect()
    got_duck = {}
    for i, t in enumerate(EDGE_TEXTS):
        lit = t.replace("'", "''")
        got_duck[i] = con.sql(
            f"SELECT len(string_split_regex(trim('{lit}'), '\\s+'))"
        ).fetchone()[0]
    con.close()

    assert got_spark == got_duck, {
        i: (repr(EDGE_TEXTS[i]), got_spark[i], got_duck[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
