"""Shared helpers for oracle-exact query construction.

The driver's correctness gate hashes values exactly, so any aggregate over
DOUBLE must be made order-insensitive: naive float summation depends on
partition/merge order, which differs between Spark (partial+final over 32
shuffle partitions) and DuckDB (its own parallel aggregation). The fix is to
sum in DECIMAL (exact, associative) and cast the final result back to DOUBLE:

    Spark : F.sum(col.cast("decimal(18,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)

Both engines round the same IEEE double to the same 6-decimal value, sum
exactly, and convert the same decimal back to the same double. Averages are
computed as exact-sum / count in DOUBLE (identical operands → identical
result), never via the engines' own AVG (whose internal accumulation order
is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dsum", "davg", "dexpr"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 6) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    return F.sum(_c(col).cast(f"decimal(28,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 6) -> Column:
    """avg = exact-sum / count, computed in double (deterministic)."""
    c = _c(col)
    return dsum(c, scale) / F.count(c)


def dexpr(sql: str) -> Column:
    return F.expr(sql)
