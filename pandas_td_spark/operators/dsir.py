"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, public paper; PAPERS.md corpus-curation family, SURVEY.md §2.10 L4+).

Select raw-corpus documents that "look like" a small target corpus by
importance weighting in a hashed n-gram feature space:

1. featurize every document as counts over ``n_buckets`` hashed word
   uni+bigram buckets (the paper's hashed n-gram generative model);
2. fit smoothed categorical distributions p (target) and q (raw source)
   over buckets — two broadcast-sized tables, each at most ``n_buckets``
   rows no matter the corpus size;
3. score each document with its importance log-weight
   ``sum_b count_b * ln(p_b / q_b)``;
4. resample without replacement via the Gumbel top-k trick
   (log-weight + Gumbel noise), with the noise derived from a seeded
   md5 of the doc id so selection is deterministic and
   partitioning-independent.

r10: bucket and Gumbel hashing moved from xxhash64 to the seeded-md5
discipline (q127/q131 family), which makes the WHOLE pipeline —
featurization, both smoothed fits, scoring, resample — reproducible by
an ANSI-SQL oracle; the per-bucket log-ratio is rounded to 9 dp before
the exact decimal scoring sum, so cross-engine ln() ulp differences
cannot reach the weights.

Spark shape: ONE token explode feeds both distribution fits and the
scoring join; the p/q ratio table is broadcast; the only wide shuffles are
groupBy(bucket) (bounded at n_buckets groups) and groupBy(doc_id) for the
per-doc sum — exactly the shape of the unigram-NLL scorer
(queries/curation.py::q95). Everything stays JVM-side (xxhash64, explode,
broadcast hash join); no Python UDFs. At 100 TB: the feature space is
fixed-size model state, documents stream through one scan, and the final
top-k is a TakeOrdered — no quadratic stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_weights", "dsir_select"]


def _bucketed_ngrams(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, seed: int
) -> DataFrame:
    """(id, bucket) rows: one per word unigram AND word bigram occurrence,
    hashed into ``n_buckets``. Tokenization = lowercase whitespace split
    (the BPE/quality operators' convention)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    nb = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, nb),
            F.slice(toks, 2, nb),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(grams).alias("g"),
    ).select(
        "id",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}:"), F.col("g"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )


def _bucket_logprob(grams: DataFrame, n_buckets: int, alpha: float) -> DataFrame:
    """Smoothed categorical log-distribution over buckets from raw gram
    occurrences (explode grain)."""
    counts = grams.groupBy("bucket").agg(F.count("*").alias("n"))
    return _bucket_logprob_from_counts(counts, n_buckets, alpha)


def _bucket_logprob_from_counts(
    counts: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    """Smoothed categorical log-distribution over buckets:
    ln((count_b + alpha) / (N + alpha*n_buckets)). Untouched buckets get
    the floor mass via a dense sequence spine, so the returned table always
    has exactly ``n_buckets`` rows (broadcastable by construction)."""
    spine = counts.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    dense = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    # the normalizer rides as a lazy broadcast 1-row aggregate — a
    # driver-side .first() here would add a full extra scan of the gram
    # explode per distribution (two per dsir_weights call). The double
    # arithmetic ((exact-int total) + alpha*n_buckets, then one IEEE
    # divide) is identical either way.
    tot = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("__tot")
    )
    return dense.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log(
            (F.col("n") + F.lit(alpha))
            / (F.col("__tot") + F.lit(alpha * n_buckets))
        ).alias("logp"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 0.5,
    seed: int = 23,
) -> DataFrame:
    """Per-document importance log-weights: raw docs scored by how much
    more likely their hashed-n-gram profile is under ``target``'s
    distribution than under ``raw``'s own. Returns (id_col, log_weight);
    documents with no tokens score 0."""
    raw_grams = _bucketed_ngrams(raw, text_col, id_col, n_buckets, seed)
    tgt_grams = _bucketed_ngrams(target, text_col, id_col, n_buckets, seed)
    # collapse the raw explode to (doc, bucket) COUNT grain and
    # MATERIALIZE it: this is the DSIR featurization output — both the
    # q-distribution fit and the scoring join consume it, and without
    # the checkpoint Catalyst merges the fit's re-aggregation straight
    # onto the explode, running the corpus-sized token explode twice
    # per call (exchange reuse can't fire across the merged shapes).
    # The checkpoint is O(docs x distinct buckets) — the feature table
    # a production pipeline would persist anyway. cnt is cast to
    # decimal(9,0) below so decimal(28,9) x decimal(9,0) lands exactly on
    # decimal(38,9) (28+9+1 = 38 digits, scale preserved): n x llr in
    # exact decimal then equals the n-fold llr sum bit-for-bit. (A bare
    # bigint multiplicand would infer decimal(38,6) under Spark's
    # allowPrecisionLoss rounding — 6dp weights, silent top-k drift.)
    raw_counts = (
        raw_grams.groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    p = _bucket_logprob(tgt_grams, n_buckets, alpha)
    q = _bucket_logprob_from_counts(
        raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("n")),
        n_buckets,
        alpha,
    )
    ratio = p.join(q.withColumnRenamed("logp", "logq"), "bucket").select(
        "bucket",
        F.round(F.col("logp") - F.col("logq"), 9).alias("llr"),
    )
    scored = (
        raw_counts.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.sum(
                F.col("llr").cast("decimal(28,9)")
                * F.col("cnt").cast("decimal(9,0)")
            ).cast("double").alias("log_weight")
        )
    )
    ids = raw.select(F.col(id_col).alias("id"))
    return (
        ids.join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 0.5,
    seed: int = 23,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Gumbel top-``k`` importance resample (without replacement): rank by
    ``log_weight + Gumbel(seeded hash of id)`` and keep the top k. The
    noise makes selection a sample from the softmax of the weights rather
    than a hard argmax (the paper's resampling step), yet fully
    deterministic: u derives from a seeded md5 of the id — a pure row
    property, stable under any partitioning. ``weights``: callers running
    several resamples (or repeated runs) over one corpus pass the
    memoized/checkpointed :func:`dsir_weights` table instead of refitting
    (the materialized-feature-table pattern the module docstring
    prescribes). The reported ``gumbel_key`` is rounded to 9 dp (the llr
    discipline); ordering uses the raw key."""
    w = weights if weights is not None else dsir_weights(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, alpha=alpha, seed=seed,
    )
    # u in (0,1): (hash mod M + 1) / (M + 2) keeps both endpoints open
    m = 1 << 40
    hh = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"gum{seed + 1}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (F.pmod(hh, F.lit(m)) + 1) / F.lit(float(m + 2))
    # the NOISE is rounded to 9 dp BEFORE it enters the key, so the
    # selection order — not just the reported value — is built from
    # cross-engine-identical doubles (libm ln() is not bit-specified;
    # without this the k-th/k+1-th boundary could flake on a 1-ulp
    # disagreement). log_weight is already exact (decimal-summed llr).
    gumbel = F.round(-F.log(-F.log(u)), 9)
    return (
        w.withColumn("gumbel_key", F.col("log_weight") + gumbel)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "log_weight",
            F.round("gumbel_key", 9).alias("gumbel_key"),
        )
    )
