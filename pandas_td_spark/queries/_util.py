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

__all__ = ["dsum", "davg", "dexpr", "bsum", "bmax", "bval"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 6) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    return F.sum(_c(col).cast(f"decimal(28,{scale})")).cast("double")


def bsum(col: str | Column, dp: int = 0) -> Column:
    """Exact bigint-scaled sum — dsum's fast twin (r15, guide §1.2):
    dsum's decimal(28,6) input forces a decimal(38,6) BigDecimal-backed
    aggregation buffer, measured 7.7x slower than this long-adder
    codegen path on the same scan (1.52 s vs 0.20 s for 6 sums over
    sf0.1 lineitem). Use for columns with a verified fixed-point data
    contract; dsum remains the generic tool for arbitrary doubles.

    Requires a per-site DATA CONTRACT: x is a double within ~1e-7 of a
    dp-decimal-place fixed-point value (verified on the fixtures for
    l_quantity dp=0, currency columns dp=2, price*(1-discount) dp=4), so
    the rounded scaled value is the exact integer numerator and the sum
    is exact, associative int64 arithmetic — the long-adder codegen path
    instead of dsum's BigDecimal buffers (the q61/q167/q183 discipline,
    now shared). Integerization is ``FLOOR(x*10^dp + 0.5)`` — pure FP
    (Spark's ``round()`` on doubles also allocates BigDecimals, measured
    3.4x slower), equal to round-half-up whenever x*10^dp is within
    ±0.5-epsilon of an integer, which the data contract guarantees. The
    ORACLE must use the lockstep formula
    ``CAST(SUM(CAST(FLOOR(x * 10^dp + 0.5) AS BIGINT)) AS DOUBLE) / 10^dp``
    (DuckDB sums BIGINT into exact HUGEINT; identical in-envelope).
    Overflow wraps SILENTLY with ANSI off, so every consumer must thread
    ``bval``'s envelope guard into its projection. While |Σ| < 2^53 the
    result is additionally bit-equal to the legacy dsum/decimal(28,6)
    formulation (exact int→double, one correctly-rounded division)."""
    c = _c(col)
    if dp == 0:
        return F.sum(c.cast("bigint"))
    return F.sum(F.floor(c * F.lit(float(10**dp)) + F.lit(0.5)))


def bmax(col: str | Column, dp: int = 0) -> Column:
    """max(abs(round(x*10^dp))) as DOUBLE — the per-group magnitude bound
    feeding ``bval``'s sound overflow envelope (pair with ``bsum``)."""
    c = _c(col)
    if dp == 0:
        return F.max(F.abs(c))
    return F.max(F.abs(F.floor(c * F.lit(float(10**dp)) + F.lit(0.5))))


def bval(
    s: Column, n: Column, m: Column, dp: int, tag: str
) -> Column:
    """Guarded descale of a ``bsum`` result: s / 10^dp as double, with the
    q183 loud-envelope discipline — n·m ≥ |Σ scaled| is a sound per-sum
    bound, checked in doubles (the guard itself cannot wrap), and
    ``assert_true`` raises instead of returning silently-wrapped sums.
    ~2^62 headroom ≈ sf200k on TPC-H cents (~150 TB); beyond it, fail
    loudly and swap that site back to dsum (same formula)."""
    in_env = (n.cast("double") * m < F.lit(float(2**62))) | (n == 0)
    val = s.cast("double")
    if dp:
        val = val / F.lit(float(10**dp))
    # assert_true -> NULL while in envelope, raises beyond it; the WHEN
    # threads it through the projection at zero plan cost (q183 shape)
    return F.when(
        F.assert_true(
            in_env, f"{tag}: bigint-scaled sum envelope exceeded"
        ).isNull(),
        val,
    )


def davg(col: str | Column, scale: int = 6) -> Column:
    """avg = exact-sum / count, computed in double (deterministic)."""
    c = _c(col)
    return dsum(c, scale) / F.count(c)


def dexpr(sql: str) -> Column:
    return F.expr(sql)
