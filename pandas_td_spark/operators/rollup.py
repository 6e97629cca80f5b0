"""Incremental distinct-count rollups over mergeable HLL sketches
(hypertable-rollup pattern; reference: TD's time-bucketed storage +
Presto ``approx_set``/``merge`` workflow, SURVEY.md §2.1/§2.5 — loci
UNVERIFIED, /root/reference empty).

The 100 TB pattern: a daily job collapses raw events into one row per
(day, key) carrying an HLL *sketch* (DataSketches binary, Spark 3.5+
``hll_sketch_agg``) instead of a distinct-user set. Any coarser window
(week, month, arbitrary range) is then a cheap ``hll_union_agg`` over a
few hundred sketch rows — no rescan of the raw table, and the merge is
associative/commutative so backfills and late partitions just re-merge.
Storage per row is KBs (lgK=12 default ≈ 2-3 KB) regardless of
cardinality.

Error contract: exact while the sketch retains raw values, ~1.6%/sqrt(2^
lgConfigK) RSE beyond (public DataSketches bound). Tests pin ≤2% vs exact
at fixture scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_sketch_rollup",
    "merge_rollup",
    "build_quantile_rollup",
    "merge_quantile_rollup",
]


def build_sketch_rollup(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    distinct_col: str,
    bucket: str = "day",
    lg_config_k: int = 12,
) -> DataFrame:
    """One row per (time bucket, *keys): HLL sketch of ``distinct_col``
    plus an exact row count. ``time_col`` is a TIMESTAMP (any flavor) or
    epoch-seconds BIGINT."""
    from pandas_td_spark.functions.td import is_timestamp_dtype

    t = F.col(time_col)
    if not is_timestamp_dtype(dict(df.dtypes).get(time_col)):
        t = F.timestamp_seconds(t)
    return (
        df.groupBy(
            F.date_trunc(bucket, t).alias("bucket_start"), *keys
        ).agg(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_config_k)).alias(
                "sketch"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def merge_rollup(
    rollup: DataFrame,
    keys: Sequence[str],
    bucket: str | None = None,
) -> DataFrame:
    """Re-aggregate a sketch rollup to coarser granularity: per *keys*
    within ``bucket`` of ``bucket_start`` (or all-time when None),
    yielding the merged distinct estimate + summed row count."""
    grp = list(keys)
    if bucket is not None:
        grp = [F.date_trunc(bucket, "bucket_start").alias("bucket_start"), *grp]
    return rollup.groupBy(*grp).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .alias("n_distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )


def build_quantile_rollup(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    value_col: str,
    bucket: str = "day",
    k: int = 800,
) -> DataFrame:
    """KLL twin of :func:`build_sketch_rollup`: one row per (bucket, keys)
    carrying a mergeable KLL quantile sketch of ``value_col`` (DOUBLE).
    ``k`` trades size for rank accuracy (~1.7%/k=200 normalized rank
    error, public DataSketches bound; k=800 ≈ 0.4%)."""
    from pandas_td_spark.functions.td import is_timestamp_dtype

    t = F.col(time_col)
    if not is_timestamp_dtype(dict(df.dtypes).get(time_col)):
        t = F.timestamp_seconds(t)
    return (
        df.groupBy(F.date_trunc(bucket, t).alias("bucket_start"), *keys)
        .agg(
            F.expr(
                f"kll_sketch_agg_double(cast(`{value_col}` as double), {k})"
            ).alias("qsketch"),
            F.count("*").alias("n_rows"),
        )
    )


def merge_quantile_rollup(
    rollup: DataFrame,
    keys: Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    bucket: str | None = None,
) -> DataFrame:
    """Merge KLL sketch rows to coarser granularity and read off
    quantile estimates — percentile dashboards with no raw rescan."""
    grp = list(keys)
    if bucket is not None:
        grp = [F.date_trunc(bucket, "bucket_start").alias("bucket_start"), *grp]
    merged = rollup.groupBy(*grp).agg(
        F.expr("kll_merge_agg_double(qsketch)").alias("qsketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(qsketch, {q}d)").alias(
            f"p{round(q * 100)}"
        )
        for q in quantiles
    ]
    names = [c for c in merged.columns if c not in ("qsketch", "n_rows")]
    return merged.select(*names, *cols, "n_rows")


def segment_overlap(
    rollup: DataFrame,
    seg_col: str,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Pairwise distinct-value overlap between segments by
    inclusion-exclusion over HLL sketches: |A∩B| ≈ est(A) + est(B) -
    est(A∪B). Input is any :func:`build_sketch_rollup` output (or a
    pre-merged one); sketches are first merged per segment, then every
    unordered segment pair is evaluated with the binary ``hll_union`` —
    a broadcast self-join over S segment rows (S² pairs of KB-sized
    sketches, never the raw data; the audience-overlap matrix a TD-style
    segmentation dashboard shows). Error compounds to ~3x the single-
    sketch RSE after subtraction; intersections much smaller than either
    side disappear into noise — use the exact path for those
    (tests pin ≤5% on the fixture's overlap sizes)."""
    seg = rollup.groupBy(F.col(seg_col).alias("seg")).agg(
        F.hll_union_agg(sketch_col).alias("sk")
    )
    a = seg.select(
        F.col("seg").alias("seg_a"), F.col("sk").alias("sk_a")
    )
    b = seg.select(
        F.col("seg").alias("seg_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(
        F.expr("hll_union(sk_a, sk_b, true)")
    )
    return pairs.select(
        "seg_a",
        "seg_b",
        est_a.alias("n_a"),
        est_b.alias("n_b"),
        est_u.alias("n_union"),
        F.greatest(est_a + est_b - est_u, F.lit(0)).alias("n_overlap_est"),
    )
