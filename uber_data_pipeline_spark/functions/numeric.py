"""Deterministic numeric aggregation helpers.

Parallel floating-point summation is order-dependent, and Spark and
DuckDB (the correctness oracle) will sum partitions in different
orders — so a raw SUM(double) can hash-mismatch even when both are
"right". Fix: evaluate the per-row expression in double (IEEE ops are
deterministic given identical inputs), cast the per-row value to
DECIMAL(25,6) (deterministic rounding), SUM exactly in decimal
(order-free), and cast back to double at the end.

Use ``dsum``/``davg`` in Spark and ``sql_dsum``/``sql_davg`` in the
oracle SQL — they are the same function in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def dsum(col: Column, round_to: int | None = 2) -> Column:
    """Order-independent sum of a double expression, as double.

    The final round happens IN DECIMAL: round(double, k) diverges
    between engines on .5 boundaries (Spark rounds the double's
    shortest decimal repr HALF_UP, DuckDB rounds the binary value),
    while decimal rounding is exact and HALF_UP in both."""
    if round_to is None:
        return F.sum(col.cast(_DEC)).cast("double")
    return F.round(F.sum(col.cast(_DEC)), round_to).cast("double")


def davg(col: Column, round_to: int | None = 6) -> Column:
    """Order-independent average (exact decimal sum / count)."""
    out = F.sum(col.cast(_DEC)).cast("double") / F.count(F.lit(1))
    return F.round(out, round_to) if round_to is not None else out


def sql_dsum(expr: str, round_to: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,6))), {round_to}) AS DOUBLE)"


def sql_davg(expr: str, round_to: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT(*), {round_to})"
    )
