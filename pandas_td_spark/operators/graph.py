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
    "orient_edges",
    "triangle_counts",
    "bfs_levels",
    "kcore_peel",
]

#: Node-id width used to pack (degree, node) into one orderable BIGINT
#: rank. Node ids must fit in 32 bits; degree dominates the ordering and
#: the id breaks ties, making the orientation a strict total order.
_ID_BITS = 32

#: hard depth gate for bfs_levels(frontier_hint="fused") — the fused
#: candidate multiset is PATHS (no dedup before the terminal aggregate),
#: so it grows like degree^depth; 4 hops covers the co-purchase /
#: friends-of-friends class the mode exists for (ADVICE r10)
_FUSED_MAX_DEPTH = 4


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


def orient_edges(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """Orient distinct undirected edges LOW-degree → HIGH-degree (rank =
    degree-then-id, a strict total order) and return the checkpointed
    ``(src, dst, dst_rank)`` frame — the shared input of wedge
    generation and closure verification (Schank-Wagner orientation; see
    module docstring for the skew argument).

    ``materialize=False`` skips the defensive edge checkpoint when the
    caller already holds a materialized edge frame (e.g. the memoized
    co-purchase edge cache) — re-checkpointing a checkpoint is a full
    extra copy job. The ORIENTED frame is always checkpointed: it is
    probed three times downstream, and callers memoize it across the
    graph query family the same way the edge cache memoizes edges.
    """
    if materialize:
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
    # Referenced three times downstream (both wedge spokes + closure
    # probe).
    return e.select(
        F.when(F.col("rank_u") < F.col("rank_v"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("src"),
        F.when(F.col("rank_u") < F.col("rank_v"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("dst"),
        F.greatest("rank_u", "rank_v").alias("dst_rank"),
    ).localCheckpoint()


def triangle_counts(
    edges: DataFrame | None = None,
    oriented: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts.

    ``edges`` must be distinct undirected pairs (``undirected_edges``
    output); alternatively pass a pre-built ``oriented`` frame
    (``orient_edges`` output — memoizable across the graph family).
    Returns ``(node, n_triangles)`` for every node in at least one
    triangle; each triangle contributes 1 to each of its three nodes.
    """
    if oriented is None:
        if edges is None:
            raise ValueError("pass edges or oriented")
        oriented = orient_edges(edges, materialize=materialize)
    l = oriented.select(
        F.col("src"), F.col("dst").alias("x"), F.col("dst_rank").alias("rx")
    )
    r = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("dst_rank").alias("ry")
    )
    # Pack the wedge endpoints into ONE bigint join key (ids fit 32 bits
    # — the _ID_BITS contract the rank packing already relies on). The
    # closure probe then joins on a single long: half the shuffle bytes
    # for the wedge set (the dominant data volume — sum C(outdeg,2)
    # rows), a radix-sortable SMJ key, and an 8-byte/row closing side
    # that AQE can broadcast whenever the edge list fits its threshold
    # (it does at bench scale; at 100 TB AQE's size check falls back to
    # the co-partitioned SMJ, which is the correct plan there).
    wedges = (
        l.join(r, "src")
        .where(F.col("rx") < F.col("ry"))
        .select(
            "src",
            (F.shiftleft(F.col("x"), _ID_BITS) + F.col("y")).alias("xy"),
        )
    )
    # A wedge src→{x, y} closes iff the oriented edge x→y exists (x has
    # lower rank than y by construction, so only that direction can).
    closing = oriented.select(
        (F.shiftleft(F.col("src"), _ID_BITS) + F.col("dst")).alias("xy")
    )
    tri = wedges.join(closing, "xy")
    x = F.shiftright("xy", _ID_BITS)
    y = F.col("xy") - F.shiftleft(F.shiftright("xy", _ID_BITS), _ID_BITS)
    return (
        tri.select(
            F.explode(
                F.array(F.col("src"), x.cast("bigint"), y.cast("bigint"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def bfs_levels(
    edges: DataFrame | None = None,
    source=None,
    max_depth: int = 4,
    materialize: bool = True,
    broadcast_frontier_rows: int = 1_000_000,
    frontier_hint: str = "auto",
    adjacency: DataFrame | None = None,
) -> DataFrame:
    """Single-source BFS levels by frontier expansion — the standard
    distributed BFS (no per-node state, no driver traversal). ``edges``
    as from ``undirected_edges`` (``materialize=False`` when the caller
    already holds a checkpointed edge frame). Returns ``(node, level)``
    for nodes within ``max_depth`` hops.

    Per-round plan, tuned so each round is ONE shuffle and ONE
    scheduled job:

    - round 1 is a FILTER on the adjacency, not a join (the seed is one
      literal node, and distinct edges make its neighbor set already
      unique);
    - candidate dedup and visited-exclusion are FUSED into a single
      aggregation: candidates (marker 0) union the visited set
      (marker 1), group by node, keep groups whose max marker is 0 —
      one shuffle where distinct + anti-join cost two;
    - each round runs exactly ONE job: the frontier is ``persist()``ed
      and the round's ``count()`` materializes the cache, sizes the
      frontier for the broadcast decision, and doubles as the
      emptiness check. The cache (not a checkpoint) is what stops
      round k replaying rounds 1..k-1 — recomputation is cut at
      RUNTIME by the cached blocks, while Catalyst plan depth grows
      only linearly in ``max_depth``, which is bounded here. (The
      previous eager ``localCheckpoint()`` + separate ``count()`` was
      two scheduled jobs per round — pure overhead on a short loop:
      q164 at sf0.1 paid 1.45 s vs DuckDB's 0.64 s mostly in job
      scheduling. pyspark's lazy checkpoint does NOT fuse with the
      count: measured 9 jobs/run either way, so persist is the only
      one-job-per-round form.)
    - frontiers under ``broadcast_frontier_rows`` are broadcast-hinted
      into the adjacency probe so the big side never shuffles; larger
      frontiers fall back to the plain shuffle join — the scale-safe
      path.

    ``frontier_hint`` picks how that broadcast decision is made:

    - ``"auto"`` (default, scale-safe): per-round ``count()`` sizes the
      frontier and doubles as the emptiness early-exit — one scheduled
      job per round.
    - ``"broadcast"``: the caller PROMISES every frontier fits a
      broadcast (true for shallow single-source probes: the frontier is
      bounded by degree^depth). The loop then runs ZERO driver actions —
      every frontier is persist()ed lazily, broadcast-hinted, and the
      one terminal action executes the whole expansion (caches populate
      on first use and are shared by the later rounds within the job).
      Exhausted graphs just run empty, cheap rounds.
    - ``"shuffle"``: never broadcast (adversarially skewed graphs);
      per-round counts only serve the emptiness exit.
    - ``"fused"``: the zero-overhead form for SHALLOW, bounded-fanout
      probes (q164's 3-hop single-source shape): chained broadcast
      probes with NO per-round dedup or visited-exclusion — the
      candidate multiset is carried as paths and a single terminal
      ``min(level)`` aggregate recovers BFS levels (exactly the
      recursive-CTE-with-UNION shape SQL engines run). Zero persists,
      zero driver actions, ONE shuffle total; per-round stage latency
      (broadcast build + AQE re-plan + dedup aggregate, ~0.5 s/round
      measured at sf0.1) collapses into one pipeline. The caller
      promises candidates stay bounded: path count grows like
      degree^depth, so this is for small max_depth on bounded-degree
      graphs — deep or high-fanout traversals must use the dedup modes
      above, which prune revisits every round.
    ``adjacency`` (mutually exclusive with ``edges``): a pre-built —
    ideally memoized/checkpointed — bidirectional ``(u, v)`` frame; a
    session running several BFS probes over one graph should
    materialize the adjacency once (the edge-cache pattern) rather than
    letting every call re-derive and re-persist its own copy.
    """
    # every frame this call persist()s is tracked on the RESULT as
    # ``_graph_cached`` so long-lived sessions can evict after the
    # terminal action materializes (``release_cached``, ADVICE r8) —
    # the result is lazy, so eviction inside this function would defeat
    # the caches before they ever serve a probe.
    cached: list[DataFrame] = []
    if adjacency is not None:
        if edges is not None:
            raise ValueError("pass edges or adjacency, not both")
        adj = adjacency
        spark = adjacency.sparkSession
    else:
        if edges is None:
            raise ValueError("pass edges or adjacency")
        spark = edges.sparkSession
        # One materialization of the (possibly expensive) edge
        # derivation — the adjacency is probed every round.
        if materialize:
            edges = edges.localCheckpoint()
        # the adjacency is probed by EVERY round's join inside the same
        # job — a lazy persist makes the union-of-both-directions compute
        # once and serve all probes from cache instead of once per round
        adj = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).persist()
        cached.append(adj)
    seed = spark.createDataFrame(
        [(source, 0)], "node bigint, level int"
    )
    if frontier_hint not in ("auto", "broadcast", "shuffle", "fused"):
        raise ValueError(f"bad frontier_hint {frontier_hint!r}")
    # depth 1: distinct undirected edges ⇒ the neighbor multiset of one
    # node is already a set, so a filter + projection suffices.
    f1 = adj.where(F.col("u") == F.lit(source)).select(
        F.col("v").alias("node")
    )
    if frontier_hint == "fused":
        # the fused candidate multiset carries PATHS, not nodes — it
        # grows like degree^depth with no dedup until the terminal
        # aggregate, so misuse must fail loudly (ADVICE r10): the
        # docstring's shallow-traversal contract is now a hard gate;
        # deep or high-fanout traversals belong to the sized/dedup modes
        if max_depth > _FUSED_MAX_DEPTH:
            raise ValueError(
                f"frontier_hint='fused' is bounded to max_depth <= "
                f"{_FUSED_MAX_DEPTH} (path multiset grows like "
                f"degree^depth); use frontier_hint='auto' for deeper "
                f"traversals"
            )
        parts = [seed, f1.withColumn("level", F.lit(1))]
        cur = f1
        for depth in range(2, max_depth + 1):
            cur = (
                F.broadcast(cur)
                .join(adj, cur["node"] == adj["u"])
                .select(F.col("v").alias("node"))
            )
            parts.append(cur.withColumn("level", F.lit(depth)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.groupBy("node").agg(
            F.min("level").cast("int").alias("level")
        )
        out._graph_cached = cached
        return out
    f1 = f1.persist()
    cached.append(f1)
    actionless = frontier_hint == "broadcast"
    parts = [seed, f1.withColumn("level", F.lit(1))]
    visited = seed.select("node").unionAll(f1)
    frontier = f1
    # one job per round in the sized modes: cache + size + emptiness
    n_frontier = None if actionless else f1.count()
    for depth in range(2, max_depth + 1):
        if n_frontier == 0:
            break
        if actionless:
            use_broadcast = True
        elif frontier_hint == "shuffle":
            use_broadcast = False
        else:
            use_broadcast = n_frontier <= broadcast_frontier_rows
        probe = F.broadcast(frontier) if use_broadcast else frontier
        cand = probe.join(adj, frontier["node"] == adj["u"]).select(
            F.col("v").alias("node"), F.lit(0).alias("vis")
        )
        nxt = (
            cand.unionAll(visited.select("node", F.lit(1).alias("vis")))
            .groupBy("node")
            .agg(F.max("vis").alias("v"))
            .where(F.col("v") == 0)
            .select("node")
        )
        if depth == max_depth:
            # the last frontier is consumed exactly once (final union):
            # no reuse to cut, nothing to gate — stay lazy, zero extra
            # jobs, and let the terminal action run the round.
            parts.append(nxt.withColumn("level", F.lit(depth)))
            break
        nxt = nxt.persist()  # lazy in "broadcast" mode: fills at the
        # terminal action, shared by later rounds within that job
        cached.append(nxt)
        if not actionless:
            n_frontier = nxt.count()
            if n_frontier == 0:
                break
        parts.append(nxt.withColumn("level", F.lit(depth)))
        visited = visited.unionAll(nxt)
        frontier = nxt
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out._graph_cached = cached
    return out


def release_cached(result: DataFrame) -> None:
    """Evict the frames a graph operator persist()ed for ``result``
    (tracked in ``result._graph_cached``). Call AFTER the terminal
    action has materialized — repeated BFS probes in a long session
    otherwise accumulate cached frontier/adjacency blocks (ADVICE r8).
    No-op for frames from other operators; tolerates frames whose
    SparkSession has since been stopped (best-effort eviction must
    never fail the NEXT query). Non-blocking."""
    for df in getattr(result, "_graph_cached", []):
        try:
            df.unpersist(False)
        except Exception:  # stopped session / dead JVM context
            pass


def kcore_peel(
    edges: DataFrame, k: int, rounds: int, materialize: bool = True
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` iterations of "drop nodes with
    degree < k, restrict edges to survivors". A FIXED round count makes
    the result a deterministic function of the graph that an oracle can
    unroll; full k-core = iterate to fixpoint (monotone, ≤ |V| rounds).
    Returns surviving ``(node, deg)`` after the last round.
    ``materialize=False`` when the caller's edge frame is already
    checkpointed (the memoized edge cache).

    Why per-round EDGE checkpoints stay (r10 A/B at sf0.1, 3 rounds,
    k=12): unlike BFS, each peel round consumes the edge frame TWICE
    (degree agg + survivor join), so a fully-lazy q164-style form
    duplicates the round subtree 2^rounds times — measured 1.72-2.04 s
    vs this form's 1.78 s (no win), and a lazy-persist variant was
    strictly worse (2.4-2.8 s, 38 scheduled stages from the
    persist/broadcast interplay). The peel is genuinely iterative
    data-volume work, not scheduling overhead.

    Why the per-round KEEP checkpoint went (r12 A/B, same shape,
    interleaved min-of-6): the survivor list derives from the
    already-checkpointed edge frame, so its two join consumers recompute
    at most one cheap agg over a cached RDD (often a ReusedExchange) —
    while checkpointing it cost a blocking job per round. min 2.75 s
    (ckpt) vs 1.89 s (lazy) at sf0.1.

    r13 re-A/B (VERDICT r12 #4 — the driver's r12 battery showed q166
    cold 2.0 -> 3.0 s coincident with the drop, so the call was
    re-measured in a CLEAN session, interleaved x6 with a GC drain
    before every run): lazy median 2.62 s / min 2.24 vs keep-checkpoint
    median 2.90 / min 2.73 — the lazy form wins again and stays; the
    battery regression was the r12 session-pressure artifact the
    per-repeat bench drain now removes (bench.py r13 note).

    r15 (guide §1.2 — fewer jobs, same passes): two refinements to HOW
    the per-round edge checkpoints materialize, neither changing the
    2-consumers-per-round analysis above. (a) The LAST round's edge
    frame feeds only the terminal aggregate's ONE action — its union
    does reference the frame twice (u-leg + v-leg), so the un-
    checkpointed round-``rounds`` join is evaluated once per leg, but
    both legs probe REUSED broadcasts over the cached prior-round
    blocks; the extra probe pass measured cheaper than an eager
    materialize job + block write (the duplication the interior
    checkpoints exist to stop is the 2^rounds SUBTREE blowup, which a
    single terminal union does not trigger).
    (b) The interior rounds use ``localCheckpoint(eager=False)``: the
    lineage cut and block reuse are identical, but materialization
    happens inside the NEXT round's first consumer instead of a
    standalone blocking job per round (this is NOT the r10
    "lazy-persist" variant — persist kept full lineage visible to the
    planner and exploded to 38 stages; a lazy localCheckpoint still
    truncates the plan at first materialization). Interleaved A/B at
    sf0.1 (x7, GC drain per run): eager-all 2.57 -> last-lazy 2.33 ->
    +lazy-interior 2.07 s median; results exceptAll-identical and
    oracle-green at all three SFs. A single-scan explode degree
    variant re-measured neutral-to-worse (2.11 vs 2.00) and the union
    form stays.
    """
    e = edges if not materialize else edges.localCheckpoint()
    for i in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select("v"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        e = e.join(keep.withColumnRenamed("node", "u"), "u").join(
            keep.withColumnRenamed("node", "v"), "v"
        )
        if i < rounds - 1:
            e = e.localCheckpoint(eager=False)
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
