"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent; Spark and the DuckDB oracle
aggregate in different orders, so ``SUM(double)`` is not reproducible
bit-for-bit across engines (or even across two runs with different
partitioning). Every value-checked aggregate therefore goes through exact
decimal arithmetic: cast each addend to ``DECIMAL(38, s)`` (exact, since the
test data carries <= 4 decimal digits and fp error is far below the decimal
half-ulp), sum exactly, and cast the final result back to ``DOUBLE`` (a
single deterministic IEEE rounding).

The oracle-side mirror is ``CAST(SUM(CAST(x AS DECIMAL(38, s))) AS DOUBLE)``.

This also matters at 100 TB for a different reason: money-style columns
summed as double silently lose integer cents at ~2^53; decimal sums do not.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact (order-independent) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum average: decimal sum divided by count, as double.

    ``sum_dec / count`` is one deterministic IEEE division, unlike
    ``AVG(double)`` whose partial-aggregation order varies.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def oracle_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB SQL mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 6) -> str:
    """DuckDB SQL mirror of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )
