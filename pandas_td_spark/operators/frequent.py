"""Heavy hitters: ``approx_most_frequent`` (reference: Presto's
``approx_most_frequent(buckets, value, capacity)``, SURVEY.md §2.8 scalar
surface — loci UNVERIFIED, /root/reference empty).

Distributed SpaceSaving: each partition keeps only its ``capacity`` most
frequent values (bounded memory regardless of partition size), the
summaries merge by key, and the global top-k comes off the merged counts.

Error contract (standard SpaceSaving / Misra-Gries merge bound): any value
whose true partition-local count exceeds ``n_partition / capacity`` is
retained, so merged counts undercount by at most
``sum_p(n_p / capacity)``. With ``capacity`` comfortably above the number
of distinct hot values, results are EXACT — which is how the fixture
queries certify it against a plain GROUP BY oracle while the operator
stays bounded-memory on 100 TB of skewed tokens.

At scale this is the plan you want for "top 1000 tokens over 10^13
tokens": the explode feeds a partial ``value_counts`` per Arrow batch
stream (O(capacity) state), the shuffle carries at most
``partitions x capacity`` rows instead of the full distinct-value set,
and the final top-k is a tiny sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_most_frequent",
    "count_min_build",
    "count_min_estimate",
    "count_min_merge",
]


def approx_most_frequent(
    df: DataFrame,
    col: str | Column,
    k: int,
    capacity: int = 4096,
    out_value: str = "value",
    out_count: str = "est_count",
) -> DataFrame:
    """Top-``k`` values of ``col`` by estimated frequency.

    ``capacity`` bounds per-partition summary size (SpaceSaving synopsis).
    Deterministic tie-break: count desc, then value asc.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if capacity < k:
        raise ValueError("capacity must be >= k")
    c = F.col(col) if isinstance(col, str) else col
    src = df.select(c.cast("string").alias(out_value))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # streaming per-partition synopsis: fold each Arrow batch into a
        # bounded counter dict, truncating to `capacity` between batches
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf[out_value].dropna().value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
            if len(counts) > capacity:
                # SpaceSaving truncation: keep the `capacity` largest;
                # values evicted here are the source of undercount
                counts = counts.nlargest(capacity)
        if counts is not None and len(counts):
            yield pd.DataFrame(
                {out_value: counts.index, out_count: counts.to_numpy("int64")}
            )

    merged = (
        src.mapInPandas(summarize, f"{out_value} string, {out_count} long")
        .groupBy(out_value)
        .agg(F.sum(out_count).alias(out_count))
    )
    return (
        merged.orderBy(F.desc(out_count), F.asc(out_value)).limit(k)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the OTHER classical
# frequency synopsis (reference: Presto/TD expose SpaceSaving via
# approx_most_frequent; CMS is its mergeable point-query dual, SURVEY.md
# §2.10 sketch family). Estimates are exact-or-OVER (never under), with
# err <= e/width * N at confidence 1 - (1/2)^depth.
#
# Spark-first formulation: the sketch is a LONG-FORM DataFrame of
# (pos, count) — one row per touched counter — built with nothing but
# explode + groupBy. No Python in the loop: positions come from d
# independent xxhash64(value, seed=i) % width expressions (JVM, codegen).
# The synopsis bound is enforced by Catalyst itself: partial (map-side)
# aggregation collapses each partition to <= depth*width rows before the
# shuffle, so the exchange carries O(partitions * depth * width) rows no
# matter how many input rows — the same bounded-shuffle property a hand-
# rolled accumulator would give, with whole-stage codegen for free.
# Merging sketches (daily rollup -> monthly) is union + groupBy-sum, an
# associative/commutative merge like operators/rollup.py's HLL pattern.
# ---------------------------------------------------------------------------
def _cms_positions(c: Column, depth: int, width: int) -> Column:
    """Array of `depth` flat counter positions (row i's slot offset by
    i*width), from independent seeded xxhash64 draws."""
    return F.array(
        *[
            (F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width)) + i * width).cast(
                "int"
            )
            for i in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame,
    col: str | Column,
    depth: int = 5,
    width: int = 8192,
) -> DataFrame:
    """Count-Min sketch of ``col`` frequencies as (pos INT, count BIGINT).

    NULLs are skipped (SQL aggregate convention). The result has at most
    ``depth * width`` rows and merges with other sketches of the same
    (depth, width) via :func:`count_min_merge`."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    return (
        df.where(c.isNotNull())
        .select(F.explode(_cms_positions(c, depth, width)).alias("pos"))
        .groupBy("pos")
        .agg(F.count("*").alias("count"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): element-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("pos").agg(F.sum("count").alias("count"))


def count_min_estimate(
    sketch: DataFrame,
    values: DataFrame,
    col: str | Column,
    depth: int = 5,
    width: int = 8192,
    out_count: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for each row of ``values``: the estimate is
    the MIN over the ``depth`` counters the value hashes to (an untouched
    counter reads 0). ``values`` keeps all its columns; one broadcast hash
    join on pos — the sketch is at most depth*width rows by construction,
    always broadcastable."""
    c = F.col(col) if isinstance(col, str) else col
    probed = values.withColumn(
        "__pos", F.explode(_cms_positions(c.cast("string"), depth, width))
    ).join(F.broadcast(sketch), F.col("__pos") == sketch["pos"], "left")
    return (
        probed.groupBy(*[values[x] for x in values.columns])
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias(out_count))
    )
