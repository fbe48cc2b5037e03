"""Shared helpers for oracle-exact query authoring.

Why DECIMAL: all money columns in the fixtures carry exactly 2 decimal
digits, so casting to DECIMAL before aggregation makes sums *exact* and
therefore independent of partition/summation order — Spark and DuckDB then
agree bit-for-bit after the final cast back to DOUBLE. Double-sums would
differ in the last ulps between engines (different reduction trees) and
fail the driver's exact value-hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    return (F.sum(expr).cast("double") / F.count(F.lit(1))).alias(alias)


# revenue := l_extendedprice * (1 - l_discount), exact in decimal
def revenue_expr() -> Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))


REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
