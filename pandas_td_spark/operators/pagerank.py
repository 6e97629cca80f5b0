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

Small-graph fast path: when the (usually pre-aggregated) edge list fits
the driver comfortably (``small_graph_threshold`` edges, same contract as
operators/cluster.py's union-find gate), the fixpoint runs as a local
numpy loop — iterating a 1000-executor cluster over a 36-edge
type-transition graph pays ~4 shuffles/iteration for nothing. Both paths
implement the identical update rule and agree to < 1e-12 (pinned in
tests/test_operators.py); the distributed path remains the contract for
graphs that don't fit (user-graph scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

_CHECKPOINT_EVERY = 5


def _driver_pagerank(
    spark, frac_rows, node_list, damping: float, n_iter: int
) -> DataFrame:
    """Local numpy fixpoint over a collected (src, dst, f) edge list —
    same update rule as the distributed loop, deterministic through a
    sorted node index."""
    import numpy as np

    nodes = sorted(node_list)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    srcs = np.array([idx[r[0]] for r in frac_rows], dtype=np.int64)
    dsts = np.array([idx[r[1]] for r in frac_rows], dtype=np.int64)
    fs = np.array([float(r[2]) for r in frac_rows], dtype=np.float64)
    has_out = np.zeros(n, dtype=bool)
    has_out[srcs] = True
    r = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        inflow = np.zeros(n)
        np.add.at(inflow, dsts, r[srcs] * fs)
        dangling = float(r[~has_out].sum())
        r = teleport + damping * (inflow + dangling / n)
    return spark.createDataFrame(
        [(nodes[i], float(r[i])) for i in range(n)], "node string, rank double"
    ) if nodes and isinstance(nodes[0], str) else spark.createDataFrame(
        [(nodes[i], float(r[i])) for i in range(n)], "node bigint, rank double"
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 15,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    small_graph_threshold: int = 200_000,
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
    out_w = e.groupBy("src").agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("ow")
    )
    # normalized contribution fraction per edge — static across iterations
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("f"))
        .localCheckpoint(eager=False)
    )
    if small_graph_threshold > 0:
        # ONE gating action: pull at most threshold+1 normalized edges.
        # Fits → the whole fixpoint runs driver-side, with the node set
        # derived from the collected edges (every node is a src or dst
        # by construction). The previous gate spent FOUR actions
        # (nodes.count, frac.count, frac.collect, nodes.collect), each
        # re-running the upstream edge derivation — 19 scheduled jobs
        # for q119's 36-edge transition graph.
        head = frac.limit(small_graph_threshold + 1).collect()
        if len(head) <= small_graph_threshold:
            if not head:
                return nodes.withColumn("rank", F.lit(0.0))
            node_list = sorted(
                {r.src for r in head} | {r.dst for r in head}
            )
            return _driver_pagerank(
                edges.sparkSession,
                [(r.src, r.dst, r.f) for r in head],
                node_list,
                damping,
                n_iter,
            )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
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
        # Dangling nodes (no out-edges) leak their rank; redistribute it.
        # Kept INSIDE the plan as a broadcast 1-row aggregate — a driver
        # collect here would serialize every iteration on a blocking
        # action (15 extra driver round-trips per call).
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(28,15)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ).alias("dm")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
