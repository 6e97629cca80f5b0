"""Data-layout functions: space-filling-curve clustering keys.

No reference locus (pandas-td delegated physical layout to TD's hosted
store — /root/reference is empty); the operator follows the public
Z-order/Morton-curve literature used by every lakehouse table format
(Delta OPTIMIZE ZORDER BY, Iceberg sort orders): interleave the bits of
several dimension keys so that sorting by the combined key co-locates
rows that are close in EVERY dimension, which turns multi-dimensional
range predicates into contiguous file/row-group ranges for min-max data
skipping.

Scale design: the key is a pure JVM-side integer expression (no UDF, no
shuffle of its own) — computing it over 100 TB is a map-only pass, and
the actual clustering is whatever the writer already does with a sort
key (``repartitionByRange(zkey).sortWithinPartitions(zkey)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_key_sql"]


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two
    non-negative integer columns: bit i of ``x`` lands at position 2i,
    bit i of ``y`` at 2i+1. Pure integer arithmetic — whole-stage
    codegen keeps it in the JVM."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_key_sql(x: str, y: str, bits: int = 16, div: str = "//") -> str:
    """The same interleave as SQL text (integer divide + modulo — no
    dialect bit operators), for oracle SQL and ``spark.sql`` callers.
    ``div`` is the dialect's integer-division operator: ``//`` (DuckDB,
    the default) or ``div`` (Spark SQL). Exact-integer arithmetic on
    both engines, so it matches :func:`zorder_key` bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
