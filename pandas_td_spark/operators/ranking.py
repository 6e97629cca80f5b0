"""Distributed EXACT global ranking (O1-adjacent; SURVEY.md §2.5/§2.6).

``Window.orderBy(...)`` with no PARTITION BY moves every row to ONE
partition (Spark warns "No Partition Defined") — the classic scale
killer for fact-grain global ``row_number``/``ntile``. The exact,
distributed formulation is the two-phase rank every MPP engine uses:

1. ``repartitionByRange`` on the (total) order — a range shuffle, the
   same cost a global sort pays, but the result stays spread across
   partitions;
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the id
   encodes (partition, local position), so the partition-local rank is
   derived WITHOUT another shuffle or window;
3. per-partition row counts (a ``numPartitions``-row aggregate,
   collected driver-side — bounded model state, never data) prefix-sum
   into offsets, broadcast back, and
   ``global_rank = offset[partition] + local_rank``.

Ranks are identical to the single-partition window whenever the order
is a TOTAL order (the repo's tie-break discipline: every global order
ends in a unique key). ``ntile`` follows from the rank with the exact
remainder-to-early-buckets rule both engines implement.

The distributed path is the DEFAULT (``small_threshold=0``): the
library never runs a hidden ``df.count()`` gate job, and the offsets
aggregate doubles as the total-row count (``*_with_total`` variants),
so rank+ntile costs exactly one range shuffle + one bounded offsets
job. The one-sorted-partition window fast path is opt-in for callers
that KNOW their input is aggregate-grain: pass
``small_threshold=SMALL_THRESHOLD`` together with ``input_rows``
(q156's pattern — one shared count feeds three chained ranks, and the
same call sites auto-switch to the distributed path when the input
outgrows the threshold).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_global_row_number",
    "with_global_row_number_and_total",
    "with_global_ntile",
    "SMALL_THRESHOLD",
]

_PID_SHIFT = 33  # monotonically_increasing_id = partition_id << 33 + pos


SMALL_THRESHOLD = 100_000  # opt-in gate: below this, one sorted partition
# is cheaper than the range shuffle + offsets job


def with_global_row_number_and_total(
    df: DataFrame,
    order: Sequence[Column | str],
    out: str = "rn",
    num_partitions: int | None = None,
    small_threshold: int = 0,
    input_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """Append the exact global 1-based row number under ``order`` (which
    must be a total order for deterministic results) and return
    ``(frame, total_rows)`` — the total rides along free on the offsets
    aggregate, so callers that need N (ntile, lift deciles, quantile
    normalization) never pay a separate ``count()`` job.

    Distributed two-phase rank by default: one range shuffle,
    parallelism = core count, no single-partition window anywhere.
    Opt-in fast path (``small_threshold>0`` — pass ``input_rows`` with
    it, or the gate itself must run a count job): inputs at or under the
    threshold take the ordinary window form, where one sorted partition
    beats the range shuffle + checkpoint. Values are identical on both
    paths (pinned in tests/test_ranking.py, which forces each)."""
    sess = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    if small_threshold > 0:
        # aggregate-grain opt-in. Callers pass input_rows (q156 chains
        # three ranks over one shared count); only an explicit opt-in
        # without it pays the gate's count job.
        n_rows = df.count() if input_rows is None else input_rows
        if n_rows <= small_threshold:
            from pyspark.sql import Window as W

            ranked = df.withColumn(
                out, F.row_number().over(W.orderBy(*cols)).cast("bigint")
            )
            return ranked, n_rows
    n = num_partitions or sess.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright("__mid", _PID_SHIFT).cast("int")
    local = (
        F.col("__mid")
        - F.shiftleft(F.shiftright("__mid", _PID_SHIFT), _PID_SHIFT)
        + 1
    )
    ranged = ranged.withColumn("__pid", pid).withColumn("__local", local)
    # materialize the ranged layout ONCE: repartitionByRange draws a new
    # sample seed per ACTION (seed = f(rdd.id)), so the offsets job and
    # the final pass would otherwise see different boundaries and the
    # composed ranks would be garbage (observed: consistent +k shifts).
    # localCheckpoint = one shuffle-sized materialization on the
    # executors, freed by the context cleaner when the frame is dropped
    # — the same lifecycle the graph operators use.
    ranged = ranged.localCheckpoint()
    # numPartitions-row driver collect: bounded by cluster width, not data
    counts = {
        r["__pid"]: r["c"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_expr = F.element_at(
        F.create_map(
            *[x for p in sorted(offsets) for x in (F.lit(p), F.lit(offsets[p]))]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    ranked = (
        ranged.withColumn(out, (off_expr + F.col("__local")).cast("bigint"))
        .drop("__mid", "__pid", "__local")
    )
    return ranked, acc


def with_global_row_number(
    df: DataFrame,
    order: Sequence[Column | str],
    out: str = "rn",
    num_partitions: int | None = None,
    small_threshold: int = 0,
    input_rows: int | None = None,
) -> DataFrame:
    """``with_global_row_number_and_total`` without the total — see
    that function for semantics and the scale contract."""
    ranked, _ = with_global_row_number_and_total(
        df,
        order,
        out=out,
        num_partitions=num_partitions,
        small_threshold=small_threshold,
        input_rows=input_rows,
    )
    return ranked


def with_global_ntile(
    df: DataFrame,
    order: Sequence[Column | str],
    buckets: int,
    out: str = "bucket",
    num_partitions: int | None = None,
    small_threshold: int = 0,
    input_rows: int | None = None,
) -> DataFrame:
    """Append the exact global ``ntile(buckets)`` under ``order`` —
    identical to the window ntile (remainder rows go to the earliest
    buckets) but computed with the distributed two-phase rank; the
    bucket arithmetic reuses the rank's piggybacked total, so no extra
    count job runs on either path. Integer ``div`` throughout, exact at
    any row count."""
    rn = "__gntile_rn"
    ranked, total = with_global_row_number_and_total(
        df,
        order,
        out=rn,
        num_partitions=num_partitions,
        small_threshold=small_threshold,
        input_rows=input_rows,
    )
    q, rem = divmod(total, buckets)
    if q == 0:
        # fewer rows than buckets: ntile gives row r bucket r
        return ranked.withColumn(out, F.col(rn)).drop(rn)
    big = q + 1  # first `rem` buckets carry one extra row
    cut = big * rem
    bucket = F.when(
        F.col(rn) <= cut,
        F.expr(f"({rn} - 1) div {big}") + 1,
    ).otherwise(F.expr(f"({rn} - 1 - {cut}) div {q}") + rem + 1)
    return ranked.withColumn(out, bucket.cast("bigint")).drop(rn)
