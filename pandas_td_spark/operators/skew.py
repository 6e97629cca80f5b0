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

__all__ = ["salted_agg", "salted_join"]


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: result ≡ ``left.join(right, on, how)``.

    The (large, skewed) probe side gets a per-row salt; the build side is
    replicated across all ``n_salts`` salt values, so one hot key's rows
    spread over ``n_salts`` reducers instead of hot-spotting one. Use when
    the build side is too large to broadcast AND the probe side has hot
    keys; AQE's skew-join rewrite covers the sort-merge case adaptively,
    this is the explicit form (e.g. when AQE is off or the skew is known
    up front). The build side is hinted ``shuffle_hash`` — a broadcast
    would make the salt moot (no probe-side shuffle), and the operator
    exists precisely for non-broadcastable builds.

    Only ``inner``/``left``/``left_semi`` are allowed: replicating the
    build side breaks unmatched-right multiplicity for right/full joins.
    The salt is ``monotonically_increasing_id() % n_salts`` — any per-row
    spread works; the join's OUTPUT is salt-invariant, so determinism of
    the result does not depend on the salt assignment.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r} "
            "(build-side replication breaks right/full-outer multiplicity)"
        )
    on = list(on)
    l2 = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l2.join(r2.hint("shuffle_hash"), on + ["__salt"], how)
    return out.drop("__salt")
