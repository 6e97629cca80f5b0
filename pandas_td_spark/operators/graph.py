"""Triangle counting over an undirected graph as pure DataFrame joins.

Reference locus: graph analytics shipped next to the warehouse (SURVEY.md
§2.10 — the reference delegates graph queries to its SQL engine; no client
locus, /root/reference empty). Public algorithm: degree-ordered triangle
enumeration (Schank & Wagner 2005; the MapReduce formulation is Suri &
Vassilvitskii, WWW 2011 "Counting Triangles and the Curse of the Last
Reducer").

Scale design (100 TB):
- Every step is a hash shuffle on a node id — no driver state, no collect.
- Edges are oriented LOW-degree → HIGH-degree node before wedge
  generation. This is the load-balancing trick from the paper: the number
  of wedges emitted per node is C(outdeg, 2) and orientation bounds
  outdeg by O(sqrt(m)) regardless of how skewed the raw degree
  distribution is — a celebrity node with 10^8 neighbors emits *zero*
  wedges because all its edges point inward. Without it one reducer owns
  C(10^8, 2) wedges and the job never finishes.
- The wedge→edge verification is a hash join of (v, w) wedge keys against
  the oriented edge set — Spark picks shuffle-hash or sort-merge under
  AQE; at 100 TB both sides are huge and co-partitioned by the join key.
- Triangle identity is orientation-independent, so the result equals the
  naive id-ordered triple join an oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "undirected_edges",
    "triangle_counts",
    "bfs_levels",
    "kcore_peel",
]

#: Node-id width used to pack (degree, node) into one orderable BIGINT
#: rank. Node ids must fit in 32 bits; degree dominates the ordering and
#: the id breaks ties, making the orientation a strict total order.
_ID_BITS = 32


def undirected_edges(df: DataFrame, a: str, b: str) -> DataFrame:
    """Normalize an edge list to distinct undirected edges ``(u, v)`` with
    ``u < v``. Self-loops are dropped."""
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        df.where(F.col(a) != F.col(b))
        .select(lo.alias("u"), hi.alias("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts.

    ``edges`` must be distinct undirected pairs (``undirected_edges``
    output). Returns ``(node, n_triangles)`` for every node in at least
    one triangle; each triangle contributes 1 to each of its three nodes.

    The edge list is referenced by degree counting, orientation, wedge
    generation, AND closure verification — without a lineage cut Spark
    recomputes the (possibly expensive) upstream edge derivation once per
    reference. ``localCheckpoint`` materializes it exactly once on the
    executors (same pattern as operators/cluster.py).
    """
    edges = edges.localCheckpoint()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # rank = (degree, id) packed into a bigint: a strict total order that
    # puts low-degree nodes first.
    rank = (F.col("deg").cast("bigint") * F.lit(1 << _ID_BITS)) + F.col(
        "node"
    )
    # The rank table is node-cardinality — usually far smaller than the
    # edge list, but |V| can itself be huge (10^8-node graphs), so the
    # broadcast decision is left to AQE's runtime size check rather than
    # forced here.
    ranked = deg.select("node", rank.alias("rank"))
    e = (
        edges.join(ranked.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("rank", "rank_u")
        .join(ranked.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("rank", "rank_v")
    )
    # Orient low-rank → high-rank; keep the destination's rank so wedge
    # generation can order the two spokes without another join.
    # Referenced three times below (both wedge spokes + closure probe).
    oriented = e.select(
        F.when(F.col("rank_u") < F.col("rank_v"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("src"),
        F.when(F.col("rank_u") < F.col("rank_v"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("dst"),
        F.greatest("rank_u", "rank_v").alias("dst_rank"),
    ).localCheckpoint()
    l = oriented.select(
        F.col("src"), F.col("dst").alias("x"), F.col("dst_rank").alias("rx")
    )
    r = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("dst_rank").alias("ry")
    )
    wedges = l.join(r, "src").where(F.col("rx") < F.col("ry"))
    # A wedge src→{x, y} closes iff the oriented edge x→y exists (x has
    # lower rank than y by construction, so only that direction can).
    closing = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("src", "x", "y")
    return (
        tri.select(
            F.explode(F.array("src", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def bfs_levels(
    edges: DataFrame, source, max_depth: int = 4
) -> DataFrame:
    """Single-source BFS levels by frontier expansion: each round is one
    equi-join (frontier × adjacency) + one anti-join against the visited
    set — the standard distributed BFS (no per-node state, no driver
    traversal). ``edges`` as from ``undirected_edges``. Returns
    ``(node, level)`` for nodes within ``max_depth`` hops.

    Each round's frontier is lineage-cut with localCheckpoint: without it
    round k replays rounds 1..k-1 (quadratic blowup in plan depth).
    """
    spark = edges.sparkSession
    # One materialization of the (possibly expensive) edge derivation —
    # the adjacency is probed every round.
    edges = edges.localCheckpoint()
    adj = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    levels = spark.createDataFrame(
        [(source, 0)], "node bigint, level int"
    )
    frontier = levels.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(levels, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        levels = levels.unionByName(
            nxt.withColumn("level", F.lit(depth))
        ).localCheckpoint()
        frontier = nxt
    return levels


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` iterations of "drop nodes with
    degree < k, restrict edges to survivors". A FIXED round count makes
    the result a deterministic function of the graph that an oracle can
    unroll; full k-core = iterate to fixpoint (monotone, ≤ |V| rounds).
    Returns surviving ``(node, deg)`` after the last round.
    """
    e = edges.localCheckpoint()
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select("v"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node").localCheckpoint()
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.withColumnRenamed("node", "v"), "v")
            .localCheckpoint()
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
