"""Pre-checkpoint ROUND-BODY plans for iterative / checkpointed operators.

``localCheckpoint`` is the lineage-cut discipline every iterative
operator here relies on — but it also blinds a plan audit: explaining the
returned frame shows only `Scan ExistingRDD` leaves where the interesting
per-round joins/aggregates ran (VERDICT r5 item 3: q164's PLANS.md row
was empty; q119/q121/q166 truncated). This module rebuilds ONE
representative round of each such operator as a fully LAZY frame — same
inputs, same expressions, no checkpoint — so `tools/gen_plans.py` can
record the per-round operator shape alongside the (truncated) final
plan.

Each builder MIRRORS its operator's loop body; the mirrored shape is
pinned against the operator by tests/test_plans.py (round-body operator
sets), so a plan-shape change in the operator that isn't reflected here
fails CI rather than rotting silently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["round_body", "ROUND_BODY_QUERIES"]


def _bfs_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BFS frontier-expansion round as q164 runs it since r10
    (operators/graph.py bfs_levels, frontier_hint='fused'): a chained
    broadcast probe into the adjacency, NO per-round dedup — the
    terminal min(level) aggregate recovers levels once at the end, so
    the round body is a single BroadcastHashJoin."""
    from pandas_td_spark.queries.advanced import _copurchase_edges

    edges = _copurchase_edges(spark)
    adj = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    f1 = adj.where(F.col("u") == F.lit(1)).select(F.col("v").alias("node"))
    return (
        F.broadcast(f1)
        .join(adj, f1["node"] == adj["u"])
        .select(F.col("v").alias("node"))
    )


def _kcore_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-core peel round (operators/graph.py kcore_peel): degree
    count, threshold filter, and the two survivor-restriction joins."""
    from pandas_td_spark.queries.advanced import _KCORE_K, _copurchase_edges

    e = _copurchase_edges(spark)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    keep = deg.where(F.col("deg") >= _KCORE_K).select("node")
    return e.join(keep.withColumnRenamed("node", "u"), "u").join(
        keep.withColumnRenamed("node", "v"), "v"
    )


def _triangle_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orientation prefix q121 memoizes (operators/graph.py
    orient_edges): degree aggregation + the two rank-attach joins —
    hidden behind the oriented-edge checkpoint in the final plan."""
    from pandas_td_spark.operators.graph import orient_edges
    from pandas_td_spark.queries.advanced import _copurchase_edges

    # rebuild lazily: orient_edges always checkpoints its result, so
    # mirror its body up to (not including) the checkpoint
    edges = _copurchase_edges(spark)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    rank = (F.col("deg").cast("bigint") * F.lit(1 << 32)) + F.col("node")
    ranked = deg.select("node", rank.alias("rank"))
    _ = orient_edges  # anchor: this mirrors orient_edges' plan
    return (
        edges.join(ranked.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("rank", "rank_u")
        .join(ranked.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("rank", "rank_v")
        .select(
            F.when(F.col("rank_u") < F.col("rank_v"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("src"),
            F.when(F.col("rank_u") < F.col("rank_v"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("dst"),
            F.greatest("rank_u", "rank_v").alias("dst_rank"),
        )
    )


def _pagerank_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed PageRank iteration (operators/pagerank.py): the
    rank×fraction contribution join + inflow aggregation + dangling-mass
    broadcast recombine — the loop body the per-iteration checkpoints
    (and q119's small-graph driver gate) hide from the final plan."""
    from pyspark.sql import Window as W

    e = spark.table("events")
    key = (
        F.unix_timestamp("ts").cast("bigint") * F.lit(10000000)
        + F.col("event_id")
    )
    w = W.partitionBy("user_id").orderBy("k")
    trans = (
        e.select("user_id", F.col("event_type").alias("dst"), key.alias("k"))
        .withColumn("src", F.lag("dst").over(w))
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    nodes = (
        trans.select(F.col("src").alias("node"))
        .unionByName(trans.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = trans.groupBy("src").agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("ow")
    )
    frac = trans.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("f")
    )
    ranks = nodes.withColumn("rank", F.lit(0.1))
    # r12: q119 runs the operator's round_to=12 mode — contributions
    # quantize (F.round) then sum exactly in decimal(38,12)
    contrib = (
        ranks.join(frac, ranks["node"] == frac["src"])
        .select(
            "dst",
            F.round(F.col("rank") * F.col("f"), 12)
            .cast("decimal(38,12)")
            .alias("c"),
        )
        .groupBy("dst")
        .agg(F.sum("c").cast("double").alias("inflow"))
    )
    dangling = ranks.join(
        out_w, ranks["node"] == out_w["src"], "left_anti"
    ).agg(
        F.coalesce(
            F.sum(F.col("rank").cast("decimal(28,12)")).cast("double"),
            F.lit(0.0),
        ).alias("dm")
    )
    return (
        nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "node",
            F.round(
                F.lit(0.05)
                + F.lit(0.85)
                * (
                    F.coalesce("inflow", F.lit(0.0))
                    + F.col("dm") / F.lit(8.0)
                ),
                12,
            ).alias("rank"),
        )
    )


def _cc_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One min-label propagation round (operators/cluster.py
    connected_components): neighbor-min aggregation + label update —
    behind both the per-round checkpoint and the small-graph driver
    union-find gate in q65/q159's final plans."""
    d = spark.table("documents").limit(2000)
    pairs = d.select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b")
    )
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    neighbor_min = (
        edges.join(labels, edges.b == labels.node)
        .groupBy("a")
        .agg(F.min("component").alias("nbr_component"))
    )
    return labels.join(
        neighbor_min, labels.node == neighbor_min.a, "left"
    ).select(
        "node",
        F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        ).alias("component"),
    )


def _prefix_pairs_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PPJoin pair generation (operators/dedup.py
    jaccard_pairs_prefix) rebuilt directly: since round 7 the q80/q235
    family serves pairs from a memoized localCheckpoint, so their final
    plans are RDD scans; this body records the prefix-filter join +
    exact-verify shape the checkpoint hides."""
    from pandas_td_spark.operators.dedup import jaccard_pairs_prefix

    return jaccard_pairs_prefix(
        spark.table("documents"), shingle_n=3, threshold=0.6
    )


def _dsir_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR featurization (operators/dsir.py): hashed uni+bigram
    explode collapsed to (doc, bucket) counts — checkpointed in the
    operator since round 7 (it feeds both the q-distribution fit and
    the scoring join), so the final plan hides the explode shape."""
    from pandas_td_spark.operators.dsir import _bucketed_ngrams

    d = spark.table("documents")
    grams = _bucketed_ngrams(d, "text", "doc_id", 1024, 23)
    return grams.groupBy("id", "bucket").agg(F.count("*").alias("cnt"))


#: query name -> (label, builder). One representative body per iterative
#: operator family; queries sharing the operator share the builder.
_BUILDERS: dict[str, tuple[str, Callable[[SparkSession, str], DataFrame]]] = {
    "q164_bfs_levels": ("BFS round", _bfs_round),
    "q166_kcore": ("peel round", _kcore_round),
    "q121_triangle_count": ("orientation prefix", _triangle_orientation),
    "q119_pagerank_transitions": ("pagerank iteration", _pagerank_round),
    "q65_near_dup_clusters": ("label-propagation round", _cc_round),
    "q159_cluster_survivor": ("label-propagation round", _cc_round),
    "q117_dsir_select": ("featurization (pre-checkpoint)", _dsir_featurize),
    "q80_near_dup_prefix": ("prefix-filter pair generation", _prefix_pairs_body),
    "q235_dup_rate_by_source": ("prefix-filter pair generation", _prefix_pairs_body),
    # the two-phase rank (q129/q188/q205/q221) needs no round body since
    # round 6: the literal-boundary formulation is fully lazy, so the
    # bucket expression, partitioned window, and offsets branch all
    # appear in the final plan the audit already explains
}

ROUND_BODY_QUERIES = frozenset(_BUILDERS)


def round_body(
    name: str, spark: SparkSession, sf_dir: str
) -> tuple[str, DataFrame] | None:
    """``(label, lazy_round_frame)`` for queries whose final plan hides
    per-round work behind checkpoints; None otherwise. Views for
    ``sf_dir`` must already be registered."""
    entry = _BUILDERS.get(name)
    if entry is None:
        return None
    label, fn = entry
    return label, fn(spark, sf_dir)
