"""Numeric aggregation helpers with oracle-exact semantics.

Hash-match discipline (SURVEY.md §7 "Hard parts"): double summation is
order-dependent and Spark's ROUND(double) uses the shortest-decimal-repr
(BigDecimal.valueOf) while DuckDB rounds the binary value — both are
divergence bombs. So the engine:

1. does all money arithmetic in DECIMAL (exact, order-independent),
2. applies ROUND only to DECIMAL values (identical HALF_UP in both engines),
3. casts to DOUBLE only at the output boundary,
4. emits unrounded averages as one exact-decimal->double division.

At 100 TB this is also the *correct* choice: decimal sums don't drift with
partitioning, so results are stable across AQE re-plans and retries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 digits / 4 frac digits fits every money-ish column in the testdata and
# keeps decimal multiply results under both engines' 38-digit cap.
DEC = "decimal(15,4)"
DEC_FACTOR = "decimal(15,8)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """SUM rounded to 2 — exact decimal path, double at the boundary."""
    return F.round(F.sum(dec(col)), 2).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Unrounded AVG: exact decimal sum -> double, one IEEE division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


# --- DuckDB-side oracle fragments (same formulas, ANSI SQL) -------------


def o_dsum(x: str, alias: str) -> str:
    return f"CAST(ROUND(SUM(CAST({x} AS DECIMAL(15,4))), 2) AS DOUBLE) AS {alias}"


def o_davg(x: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({x} AS DECIMAL(15,4))) AS DOUBLE) / COUNT({x})) AS {alias}"
