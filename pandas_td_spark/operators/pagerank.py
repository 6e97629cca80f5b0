"""Distributed PageRank over an edge DataFrame (iterative-algorithm
family, SURVEY.md §2.10; public algorithm — Page et al. 1999, and the
standard Spark formulation: rank join + groupBy per iteration).

Each iteration is one equi-join (ranks x edges on src) and one
groupBy(dst) sum — both shuffles keyed on node id, no driver-side data
motion. Two scalars (dangling mass, for nodes with no out-edges, and the
teleport term) are computed as 1-row aggregates. Contribution sums run in
DECIMAL so ranks are bit-identical under any partitioning (the
queries/_util.py exact-sum discipline applied to an iterative fixpoint —
this is what makes the operator testable to equality against a numpy
reference). Lineage is cut with localCheckpoint every few iterations
(same guard as operators/cluster.py's label propagation).

Weighted edges: pass ``weight``; contributions are rank * w / out_w.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

_CHECKPOINT_EVERY = 5


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 15,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Iterate ``r' = (1-d)/N + d * (in-contributions + dangling/N)`` for
    ``n_iter`` rounds from the uniform start. Returns (node, rank); ranks
    sum to 1. Duplicate (src, dst) rows act as parallel edges (their
    weights add)."""
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_w = e.groupBy("src").agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("ow")
    )
    # normalized contribution fraction per edge — static across iterations
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("f"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for i in range(n_iter):
        contrib = (
            ranks.join(frac, ranks["node"] == frac["src"])
            .select("dst", (F.col("rank") * F.col("f")).alias("c"))
            .groupBy("dst")
            .agg(
                F.sum(F.col("c").cast("decimal(28,15)"))
                .cast("double")
                .alias("inflow")
            )
        )
        # dangling nodes (no out-edges) leak their rank; redistribute
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(
                F.sum(F.col("rank").cast("decimal(28,15)")).cast("double")
            )
            .first()[0]
            or 0.0
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
