"""Connected components + near-dup cluster collapse (SURVEY.md §7
"connected components without GraphFrames"; completes the L2 dedup story:
pair lists are not deduplication until collapsed into keep/drop sets).

Algorithm: iterative min-label propagation (the simplified
large-star/small-star idea): every node repeatedly adopts the minimum
label among itself and its neighbours; converges in O(diameter)
iterations. Near-dup graphs have tiny components (dup clusters), so
convergence is fast; ``max_iterations`` bounds the worst case
(SURVEY §7 risk: "bound iterations").

Scale notes: each iteration is one join + one aggregate on (node, label)
pairs — shuffle-bounded, no driver-side graph. ``localCheckpoint``
truncates the lineage each round so plans don't grow exponentially. The
convergence check is a count of changed labels (one lightweight action per
iteration).

Labels are canonical (min node id in the component), so results are
algorithm-independent — which is what lets a DuckDB recursive-CTE oracle
verify the Spark implementation exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "collapse_near_dups"]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    driver_side_threshold: int = 200_000,
) -> DataFrame:
    """(node BIGINT, component BIGINT) for every node appearing in
    ``pairs``; component = min node id in the connected component.

    Near-dup edge sets are tiny relative to the corpus (bounded by the
    candidate-pair count), so when the deduped edge list has at most
    ``driver_side_threshold`` rows it is collected and solved with a
    driver-side union-find: exact same min-id labels, one job instead of
    ~2 Spark jobs per propagation round. Larger graphs fall through to the
    distributed min-label propagation loop (the path that scales); pass
    ``driver_side_threshold=0`` to force it.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: edges join into EVERY iteration, and without a
        # checkpoint the (possibly expensive) pair-generation lineage —
        # e.g. a full Jaccard join — would re-execute per round
        .localCheckpoint()
    )
    n_edges = edges.count()  # free: the checkpoint just materialized them
    if n_edges <= driver_side_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # collect(), not toLocalIterator(): the iterator schedules a
        # fetch job per partition while this branch's row count is
        # already bounded by driver_side_threshold (a few MB) — one
        # job, one transfer. Measured wall-neutral at sf0.1 (q159
        # 1.16 -> 1.10 s median, the difference sits under AQE stage
        # latency); kept for the strictly smaller job count at any
        # partition count.
        for r in edges.collect():
            a, b = r.a, r.b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp: dict[int, int] = {}
        for node in parent:
            root = find(node)
            comp[root] = min(comp.get(root, node), node)
        rows = [(node, comp[find(node)]) for node in sorted(parent)]
        return edges.sparkSession.createDataFrame(
            rows, "node bigint, component bigint"
        )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()

    converged = False
    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_component"), F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
        ).localCheckpoint()
        labels = new_labels.drop("__changed")
        # label propagation halves the remaining diameter every round, so a
        # convergence probe every iteration mostly measures scheduler
        # overhead — check on odd rounds (and the last); at worst this runs
        # one extra (cheap, already-converged) iteration
        if i % 2 == 1 or i == max_iterations - 1:
            if new_labels.where("__changed").count() == 0:
                converged = True
                break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            "iterations — returned labels are a partial propagation and "
            "components may be split; raise max_iterations (components with "
            "diameter > max_iterations exist in the edge set)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def collapse_near_dups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-corpus dedup labels: every row of ``df`` gets its component id
    (nodes not in any pair are their own component) plus a keep flag
    (True iff the row is the component's minimum id). Downstream:
    ``.where("keep")`` is the deduplicated corpus."""
    comp = connected_components(pairs)
    out = (
        df.join(comp, df[id_col] == comp.node, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .drop("node")
    )
    return out.withColumn("keep", F.col(id_col) == F.col("component"))
