"""Skew-mitigation operators (SURVEY.md scale notes: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitting handles *join* skew automatically; aggregation
skew on a hot key still serializes in the final reducer when a single key's
partial aggregates are wide (collect_list, large distinct sets). The
classic fix is two-phase salted aggregation:

    phase 1: groupBy(key, salt = hash(row) % n) — partials spread over n
             reducers per hot key
    phase 2: groupBy(key) — combine n partials

For algebraic aggregates (sum/count/min/max) the result is exactly the
unsalted answer, so the DuckDB oracle can verify the rewrite — which is
the point of q67.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    phase1: dict[str, Column],
    phase2: dict[str, Column],
    n_salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``phase1`` maps output-name → aggregate over raw rows; ``phase2`` maps
    final-name → aggregate over the phase-1 column of the same name (use
    e.g. sum to combine partial sums/counts, min for min, max for max).
    ``salt_on`` names a column to derive the salt from (deterministic);
    default uses ``spark_partition_id()`` which spreads without any hash
    computation.
    """
    salt = (
        (F.xxhash64(salt_on) % n_salts) if salt_on else (F.spark_partition_id() % n_salts)
    ).alias("__salt")
    p1 = df.groupBy(*keys, salt).agg(
        *[c.alias(name) for name, c in phase1.items()]
    )
    return p1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in phase2.items()]
    )
