"""Large×large interval joins (SURVEY.md §2.3 J9 — the non-broadcast half).

Reference semantics: Presto-style inequality/range joins over time windows
(``pandas_td`` delegated these to hosted Presto; module::symbol anchors
UNVERIFIED — /root/reference is empty). Spark has no native interval-join
physical operator, and a non-equi join between two LARGE inputs falls back
to BroadcastNestedLoopJoin (needs a broadcastable side) or a cartesian —
both non-starters at 100 TB.

The classic fix (used by every streaming/temporal engine, cf. Flink's
interval join and the DBToaster/IEJoin literature): **bucketize time**.
Intervals are exploded to the fixed-width buckets they overlap, points map
to exactly one bucket, and the match becomes a shuffle-partitioned
*equi-join* on the bucket id followed by the exact range predicate. Shuffle
volume is |points| + Σ⌈len/width⌉ interval replicas — linear, AQE-skew-
splittable, no nested loop anywhere in the plan.

Pick ``bucket_width`` ≈ the typical interval length: too small multiplies
interval replicas (Σ len/width), too large packs unrelated rows into the
same bucket (post-filter waste). Degenerate long intervals explode to many
buckets — cap them upstream or union a broadcast path for the outliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join"]


def _buckets_covering(start, end_exclusive, width: int):
    # floor((end-1)/w): the last bucket containing any integer < end
    return F.sequence(
        F.floor(start / width).cast("bigint"),
        F.floor((end_exclusive - 1) / width).cast("bigint"),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= point < end`` — both sides arbitrarily large.

    All three key columns must be integral (epoch seconds/millis — convert
    timestamps first); column names must be disjoint across the two inputs.
    Each qualifying pair is emitted exactly once with no distinct pass:
    a point lives in exactly one bucket, so at most one (point-bucket,
    interval-replica) row can match it.
    """
    p = points.withColumn(
        "__bkt", F.floor(F.col(point_col) / bucket_width).cast("bigint")
    )
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            _buckets_covering(F.col(start_col), F.col(end_col), bucket_width)
        ),
    )
    return (
        p.join(i, "__bkt", how)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bkt")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Join interval pairs that overlap: ``l_start < r_end AND r_start <
    l_end`` (half-open on both sides), both inputs arbitrarily large.

    Both sides explode to covering buckets, so an overlapping pair can
    share several buckets; instead of a distinct pass, a pair is kept only
    in the single bucket containing the overlap's START
    (``greatest(l_start, r_start)``) — exactly-once without a shuffle.
    """
    l = left.withColumn(
        "__bkt",
        F.explode(
            _buckets_covering(F.col(left_start), F.col(left_end), bucket_width)
        ),
    )
    r = right.withColumn(
        "__bkt",
        F.explode(
            _buckets_covering(
                F.col(right_start), F.col(right_end), bucket_width
            )
        ),
    )
    overlap_start = F.greatest(F.col(left_start), F.col(right_start))
    return (
        l.join(r, "__bkt")
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (
                F.col("__bkt")
                == F.floor(overlap_start / bucket_width).cast("bigint")
            )
        )
        .drop("__bkt")
    )
