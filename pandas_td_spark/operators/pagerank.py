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


def _driver_pagerank_rounded(
    spark, frac_rows, node_list, damping: float, n_iter: int, round_to: int
) -> DataFrame:
    """Exact replay of the ``round_to`` fixpoint (see :func:`pagerank`)
    with ``decimal``: per-edge contributions quantize HALF_UP from the
    double's SHORTEST ROUND-TRIP DECIMAL (``repr``), then sum exactly;
    the iteration's float arithmetic is the identical IEEE op sequence
    all three implementations share. Shortest-repr — not the exact
    binary expansion — is load-bearing: Spark's ``F.round`` goes through
    ``BigDecimal.valueOf`` = ``Double.toString`` (shortest repr) and
    DuckDB's ``round`` was probed to agree, while the exact expansion of
    e.g. ``round(r,12)*0.5`` is ``…x5499…9`` (just BELOW the half-way
    point its shortest repr sits ON) — 12dp ranks times dyadic edge
    fractions MANUFACTURE such ties every iteration, and quantizing the
    exact expansion rounded them the other way (caught by
    tests/test_operators.py::test_pagerank_round_to_paths_agree_exactly).
    O(edges * n_iter) Python, so strictly for gate-sized graphs (q119's
    transition graph is ~36 edges)."""
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal(1).scaleb(-round_to)

    def q(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(quantum, rounding=ROUND_HALF_UP)

    nodes = sorted(node_list)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    edges = [(idx[r[0]], idx[r[1]], float(r[2])) for r in frac_rows]
    has_out = [False] * n
    for s, _, _ in edges:
        has_out[s] = True
    r_dec = [q(1.0 / n)] * n
    rf = [float(d) for d in r_dec]
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        inflow = [Decimal(0)] * n
        for s, d, f in edges:
            inflow[d] += q(rf[s] * f)
        dangling = sum(
            (r_dec[i] for i in range(n) if not has_out[i]), Decimal(0)
        )
        dang_f = float(dangling)
        r_dec = [
            q(teleport + damping * (float(inflow[v]) + dang_f / n))
            for v in range(n)
        ]
        rf = [float(d) for d in r_dec]
    rows = [(nodes[i], rf[i]) for i in range(n)]
    schema = (
        "node string, rank double"
        if nodes and isinstance(nodes[0], str)
        else "node bigint, rank double"
    )
    return spark.createDataFrame(rows, schema)


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
    round_to: int | None = None,
) -> DataFrame:
    """Iterate ``r' = (1-d)/N + d * (in-contributions + dangling/N)`` for
    ``n_iter`` rounds from the uniform start. Returns (node, rank); ranks
    sum to 1. Duplicate (src, dst) rows act as parallel edges (their
    weights add).

    ``round_to`` (r12, the q273 playbook): quantize every rank to that
    many decimals after each iteration AND each per-edge contribution
    before its exact decimal sum. This makes the fixpoint a well-defined
    function of the edge set — independent of summation order, engine,
    and partitioning — so it replays bit-for-bit as an unrolled SQL CTE
    (q119's DuckDB oracle). At 12 decimals the per-iteration perturbation
    is ~1e-12 · edges — far below rank scale; ties at the quantization
    boundary would need a double whose exact binary expansion hits
    x.5e-12 exactly (the q57 dyadic-rational argument: effectively
    impossible for products of full-precision doubles)."""
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
            if round_to is not None:
                return _driver_pagerank_rounded(
                    edges.sparkSession,
                    [(r.src, r.dst, r.f) for r in head],
                    node_list,
                    damping,
                    n_iter,
                    round_to,
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
    if round_to is not None:
        from decimal import ROUND_HALF_UP, Decimal

        # shortest-repr quantize — must mirror _driver_pagerank_rounded
        r0 = float(
            Decimal(repr(1.0 / n)).quantize(
                Decimal(1).scaleb(-round_to), rounding=ROUND_HALF_UP
            )
        )
    else:
        r0 = 1.0 / n
    ranks = nodes.withColumn("rank", F.lit(r0))
    teleport = (1.0 - damping) / n
    for i in range(n_iter):
        c = F.col("rank") * F.col("f")
        if round_to is not None:
            # contributions quantize, then sum exactly in decimal — the
            # same value regardless of partitioning / add order
            c = F.round(c, round_to).cast(f"decimal(38,{round_to})")
        else:
            c = c.cast("decimal(28,15)")
        contrib = (
            ranks.join(frac, ranks["node"] == frac["src"])
            .select("dst", c.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        # Dangling nodes (no out-edges) leak their rank; redistribute it.
        # Kept INSIDE the plan as a broadcast 1-row aggregate — a driver
        # collect here would serialize every iteration on a blocking
        # action (15 extra driver round-trips per call).
        dangle_scale = round_to if round_to is not None else 15
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(
                        F.col("rank").cast(f"decimal(28,{dangle_scale})")
                    ).cast("double"),
                    F.lit(0.0),
                ).alias("dm")
            )
        )
        new_rank = F.lit(teleport) + F.lit(damping) * (
            F.coalesce("inflow", F.lit(0.0))
            + F.col("dm") / F.lit(float(n))
        )
        if round_to is not None:
            new_rank = F.round(new_rank, round_to)
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", new_rank.alias("rank"))
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
