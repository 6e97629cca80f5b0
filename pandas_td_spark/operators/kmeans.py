"""Distributed Lloyd k-means over an embedding column (SURVEY.md §2.10 L3
model-fitting family; complements the bounded-sample quantizer training in
operators/similarity.py — this is the FULL-CORPUS iterative fit for when
the sample isn't representative or the assignment itself is the product).

Each Lloyd iteration is one Spark job with strictly bounded state:

* **assign** — one Arrow-vectorized pandas_udf pass, batched argmin
  against the broadcast (k x dim) centroid matrix (shared rule with
  similarity._cell_assigner's ||x||^2 - 2x.c trick);
* **update** — ``posexplode(vec)`` then ``groupBy(cluster, pos)`` sums:
  map-side partial aggregation collapses every partition to at most
  ``k*dim`` rows before the shuffle, and only the (k x dim) sum/count
  table reaches the driver — model state, not data.

Determinism: the update sums run in DECIMAL (exact, associative — the
queries/_util.py discipline), so centroids are bit-identical regardless of
partitioning or merge order, which makes the whole fit reproducible on any
cluster layout. Init is the k smallest ``xxhash64(id, seed)`` rows (pure
row property, same argument as the hash-cut sampler).

At 100 TB: n_iter scans of the corpus (each pruned to the vector column),
shuffle O(partitions * k * dim) per iteration, driver O(k * dim). The
corpus is never collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign"]


def _assigner(centers: np.ndarray):
    @F.pandas_udf("int")
    def cell_of(col: pd.Series) -> pd.Series:
        if len(col) == 0 or len(centers) == 0:
            return pd.Series([], dtype="int32")
        A = np.vstack([np.asarray(v, dtype=np.float64) for v in col])
        d = (A * A).sum(1)[:, None] - 2.0 * (A @ centers.T)
        return pd.Series(d.argmin(1).astype(np.int32))

    return cell_of


def _driver_kmeans(rows, k: int, n_iter: int) -> np.ndarray:
    """Local Lloyd replay for gate-sized corpora — BIT-IDENTICAL to the
    distributed fit (pinned in tests/test_operators.py): assignment runs
    the same ``||x||^2 - 2x.c`` numpy kernel as :func:`_assigner`, and
    the centroid update mirrors the decimal discipline exactly —
    per-element ``cast(x as decimal(28,12))`` is shortest-repr HALF_UP
    quantization (Spark casts through ``BigDecimal.valueOf`` =
    ``Double.toString``), replayed here as integer 1e-12 units summed
    exactly in int64 (|x|~1, so 10k rows sum to ~1e16 << 2^63), then one
    correctly-rounded int/int -> double division per (cell, dim)."""
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal(1).scaleb(-12)
    rows = sorted(rows, key=lambda r: (r["__h"], r["id"]))
    init = sorted(rows[:k], key=lambda r: r["id"])
    centers = np.vstack([np.asarray(r["v"], dtype=np.float64) for r in init])
    A = np.vstack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    units = np.array(
        [
            [
                int(
                    Decimal(repr(float(x))).quantize(
                        quantum, rounding=ROUND_HALF_UP
                    ).scaleb(12)
                )
                for x in row
            ]
            for row in A
        ],
        dtype=np.int64,
    )
    # int64 sums are exact only inside the envelope n * max|unit| < 2^62
    # (the |x|~1 comment above is typical, not enforced) — outside it,
    # numpy would WRAP SILENTLY (C semantics) and return wrong centroids
    # where the distributed decimal fit stays exact. Fall back to exact
    # arbitrary-precision Python-int sums there: slower, never wrong.
    max_unit = int(np.abs(units).max(initial=0))
    exact_int64 = max_unit * max(len(rows), 1) < 2**62
    for _ in range(n_iter):
        d = (A * A).sum(1)[:, None] - 2.0 * (A @ centers.T)
        cell = d.argmin(1)
        new = centers.copy()
        for c in range(len(centers)):
            mask = cell == c
            n = int(mask.sum())
            if n == 0:
                continue
            if exact_int64:
                s = units[mask].sum(0, dtype=np.int64)
            else:
                s = [sum(int(u) for u in units[mask][:, j])
                     for j in range(units.shape[1])]
            new[c] = np.array(
                [int(u) / 10**12 for u in s], dtype=np.float64
            ) / n
        if np.allclose(new, centers, rtol=0, atol=0):
            return new
        centers = new
    return centers


#: One-probe driver gate (the operators/pagerank.py contract): at or
#: below this many vectors the Lloyd loop replays locally — at sf0.1 the
#: fixture corpus is 2,000 rows and the distributed fit was pure
#: scheduling overhead (measured r12: init job 0.86 s + persist 0.43 s +
#: 5 x ~0.5 s iteration jobs for ~1 MB of data). 10k keeps the fixtures
#: on the driver path while the 10x scale-audit corpus (20k vectors)
#: exercises the distributed plan — the audit measures what a production
#: pipeline would run (the EXACT_PAIRS_MAX_DOCS rationale).
SMALL_FIT_MAX_VECS = 10_000


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    n_iter: int = 10,
    dim: int = 64,
    seed: int = 29,
    id_col: str = "vec_id",
    vec: str = "embedding",
    small_fit_threshold: int = SMALL_FIT_MAX_VECS,
) -> np.ndarray:
    """Full-corpus distributed Lloyd fit; returns the (k x dim) centroid
    matrix. Empty clusters keep their previous centroid (standard Lloyd
    degeneracy handling). NULL vectors are excluded (SQL aggregate
    convention)."""
    emb = emb.where(F.col(vec).isNotNull())
    proj = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec).cast("array<double>").alias("v"),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
    )
    if small_fit_threshold > 0:
        # ONE gating action: pull at most threshold+1 vectors; fits ->
        # the whole fit replays locally from the already-collected rows
        head = proj.limit(small_fit_threshold + 1).collect()
        if len(head) <= small_fit_threshold:
            if not head:
                return np.zeros((0, dim), dtype=np.float64)
            return _driver_kmeans(head, k, n_iter)
    init = (
        proj.orderBy("__h", "id")
        .limit(k)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    if len(init) == 0:
        # empty corpus (an empty time partition is a normal production
        # input): a (0, dim) model, assignment of nothing stays nothing
        return np.zeros((0, dim), dtype=np.float64)
    centers = np.vstack([np.asarray(v, dtype=np.float64) for v in init["v"]])
    # persist the projected/cast corpus ONCE: without this every Lloyd
    # iteration re-scans and re-casts the source (n_iter full scans of
    # the corpus at 100 TB); with it, one scan feeds all iterations
    src = emb.select(F.col(vec).cast("array<double>").alias("v")).persist()
    for _ in range(n_iter):
        assigned = src.withColumn("__cell", _assigner(centers)(F.col("v")))
        # posexplode + (cell,pos) partial agg beats a dim-wide
        # one-agg-column-per-dimension form here: measured 0.63 s vs
        # 1.17 s warm at sf0.1 (64 decimal buffers defeat codegen),
        # and map-side combine still caps the shuffle at k*dim rows
        # per partition either way.
        stats = (
            assigned.select(
                "__cell", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("__cell", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = centers.copy()
        counts = np.zeros(len(centers), dtype=np.int64)
        sums = np.zeros_like(centers)
        for r in stats:
            sums[r["__cell"], r["pos"]] = float(r["s"])
            counts[r["__cell"]] = r["n"]
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        if np.allclose(new, centers, rtol=0, atol=0):
            centers = new
            break
        centers = new
    src.unpersist()
    return centers


def kmeans_assign(
    emb: DataFrame,
    centers: np.ndarray,
    id_col: str = "vec_id",
    vec: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Final assignment pass: (id, cluster, sq_dist) per non-NULL
    input row (NULL vectors excluded, matching kmeans_fit)."""
    emb = emb.where(F.col(vec).isNotNull())

    @F.pandas_udf("struct<c: int, d: double>")
    def cell_dist(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0 or len(centers) == 0:
            return pd.DataFrame({"c": pd.Series([], dtype="int32"),
                                 "d": pd.Series([], dtype="float64")})
        A = np.vstack([np.asarray(v, dtype=np.float64) for v in col])
        d = (
            (A * A).sum(1)[:, None]
            - 2.0 * (A @ centers.T)
            + (centers * centers).sum(1)[None, :]
        )
        a = d.argmin(1)
        return pd.DataFrame(
            {"c": a.astype(np.int32), "d": d[np.arange(len(A)), a]}
        )

    out = emb.withColumn("__cd", cell_dist(F.col(vec).cast("array<double>")))
    return out.select(
        F.col(id_col),
        F.col("__cd.c").alias(out_col),
        F.col("__cd.d").alias("sq_dist"),
    )
