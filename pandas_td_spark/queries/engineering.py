"""Data-engineering operators: dimension builds, physical-layout keys,
replica reconciliation, incremental rollup maintenance, Pareto
frontiers.

No reference locus (pandas-td delegated all server-side processing to
TD's hosted engines — /root/reference is empty); each operator follows
its public literature: SCD type-2 dimension builds (Kimball), Z-order
clustering keys (Morton curves, as used by Delta OPTIMIZE ZORDER BY and
Iceberg sort orders), Merkle-style partition checksums for anti-entropy
replica repair (Dynamo/Cassandra lineage), algebraic partial-aggregate
merge for incremental materialized-view refresh, and sort-based skyline
computation.

Common scale discipline: everything is keyed partial aggregation or a
bounded broadcast join; the only global orders run on the distributed
two-phase prefix operators (operators/ranking.py), never a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_td_spark.operators.zorder import (
    morton_interleave,
    morton_interleave_sql,
)
from pandas_td_spark.queries.registry import query


# ---------------------------------------------------------------------------
# SCD type-2 dimension build — turn an event stream into versioned
# validity intervals per user (valid_from / valid_to / is_current), the
# Kimball slowly-changing-dimension shape every warehouse maintains.
# Plan: the gaps-and-islands change detection (two user-partitioned
# windows), one hash aggregation to interval grain, then a
# user-partitioned lead for the interval close — every window is keyed
# by user_id, so the build parallelizes by user at any scale.
# ---------------------------------------------------------------------------
@query(
    "q241_scd2_dimension",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
      FROM flagged
    ), dim AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             CAST(floor(epoch(MIN(ts))) AS BIGINT) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM islands GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER (
                  PARTITION BY user_id ORDER BY version) IS NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           n_events
    FROM dim
    """,
)
def q241_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals per user from the event stream: one row
    per consecutive same-type run, closed by the next run's start."""
    e = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    is_new = F.when(
        prev.isNull() | (prev != F.col("event_type")), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = e.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(is_new).over(run).cast("bigint").alias("version"),
    )
    dim = islands.groupBy("user_id", "version", "event_type").agg(
        F.unix_timestamp(F.min("ts")).cast("bigint").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return dim.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Z-order clustering-key profile — the Morton-interleave layout key a
# writer sorts by so multi-dimensional range predicates hit contiguous
# row groups (operators/zorder.py — the raw interleave shared with the
# quantile-rank keyer/write_zordered). The key is a map-only JVM
# integer expression; this query profiles the induced
# bucketing of lineitem by (partkey, suppkey): per z-range bucket, the
# row count and the min-max envelope of BOTH dimensions — exactly the
# min-max stats a data-skipping index stores per file.
# ---------------------------------------------------------------------------
_ZBITS = 16
_ZBUCKET_SHIFT = 1 << 26  # 32-bit z-key -> 64 coarse buckets

@query(
    "q242_zorder_profile",
    oracle=f"""
    WITH d AS (
      SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
      FROM lineitem
    ), z AS (
      SELECT x, y,
             {morton_interleave_sql(['x', 'y'], _ZBITS)} AS zkey
      FROM d
    )
    SELECT CAST(zkey // {_ZBUCKET_SHIFT} AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zkey) AS BIGINT) AS min_z,
           CAST(MAX(zkey) AS BIGINT) AS max_z,
           CAST(MIN(x) AS BIGINT) AS min_x,
           CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y,
           CAST(MAX(y) AS BIGINT) AS max_y
    FROM z GROUP BY 1
    """,
)
def q242_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket row counts and per-dimension min-max envelopes for
    the Morton key over (l_partkey, l_suppkey)."""
    d = spark.table("lineitem").select(
        (F.col("l_partkey") % 65536).alias("x"),
        (F.col("l_suppkey") % 65536).alias("y"),
    )
    z = d.withColumn(
        "zkey",
        morton_interleave([F.col("x"), F.col("y")], _ZBITS),
    )
    return (
        z.groupBy(
            F.expr(f"zkey div {_ZBUCKET_SHIFT}")
            .cast("bigint")
            .alias("zbucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zkey").cast("bigint").alias("min_z"),
            F.max("zkey").cast("bigint").alias("max_z"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-checksum reconciliation (anti-entropy table diff) — locate
# which hash partitions of two table snapshots diverge WITHOUT moving
# either table: per-bucket row counts + an algebraic row-fingerprint
# sum (the Merkle-leaf idea from Dynamo-style replica repair). The
# replica here is simulated from orders with deterministic drift: one
# key in 997 deleted, one in 991 price-corrupted by a cent. Both sides
# are map-side partial aggregations to 64 rows; the diff join is over
# bucket ids — at 100 TB the network carries 2x64 checksums, never rows.
# The fingerprint is pure integer arithmetic (portable and exact), not
# a cryptographic hash — collision-safety is probabilistic, which is
# the standard anti-entropy trade.
# ---------------------------------------------------------------------------
_FP_MOD = (1 << 61) - 1

@query(
    "q243_partition_checksums",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), a AS (
      SELECT o_orderkey % 64 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST((o_orderkey * 1000003 + cents) % {_FP_MOD}
                  AS HUGEINT)) % {_FP_MOD} AS BIGINT) AS fp
      FROM base GROUP BY 1
    ), b_rows AS (
      SELECT o_orderkey,
             cents + CASE WHEN o_orderkey % 991 = 7 THEN 1 ELSE 0 END
               AS cents
      FROM base WHERE o_orderkey % 997 <> 13
    ), b AS (
      SELECT o_orderkey % 64 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST((o_orderkey * 1000003 + cents) % {_FP_MOD}
                  AS HUGEINT)) % {_FP_MOD} AS BIGINT) AS fp
      FROM b_rows GROUP BY 1
    )
    SELECT COALESCE(a.bucket, b.bucket) AS bucket,
           a.n AS n_a, b.n AS n_b,
           CAST(CASE WHEN a.n IS NOT DISTINCT FROM b.n
                      AND a.fp IS NOT DISTINCT FROM b.fp
                THEN 1 ELSE 0 END AS BIGINT) AS is_match
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    """,
)
def q243_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which of 64 hash buckets differ between orders and a drifted
    replica, by (row count, fingerprint-sum) checksum comparison."""
    base = spark.table("orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def checksums(df: DataFrame) -> DataFrame:
        fp = (F.col("o_orderkey") * 1000003 + F.col("cents")) % _FP_MOD
        return df.groupBy(
            (F.col("o_orderkey") % 64).alias("bucket")
        ).agg(
            F.count("*").alias("n"),
            (F.sum(fp.cast("decimal(38,0)")) % _FP_MOD)
            .cast("bigint")
            .alias("fp"),
        )

    replica = base.where(F.col("o_orderkey") % 997 != 13).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") % 991 == 7, 1).otherwise(0)
        ).alias("cents"),
    )
    a = checksums(base).alias("a")
    b = checksums(replica).alias("b")
    match = (
        F.col("a.n").eqNullSafe(F.col("b.n"))
        & F.col("a.fp").eqNullSafe(F.col("b.fp"))
    )
    return a.join(b, F.col("a.bucket") == F.col("b.bucket"), "full").select(
        F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.when(match, 1).otherwise(0).cast("bigint").alias("is_match"),
    )


# ---------------------------------------------------------------------------
# Replica repair (row level) — the second half of anti-entropy: q243's
# checksums LOCATE divergent buckets; this query then row-diffs ONLY
# those buckets. The bucket prune is a broadcast join against the
# ≤64-row diff set, so at 100 TB the row-level full-outer join touches
# the divergent fraction of the table, not all of it — and because
# unchanged buckets provably contain no diffs, the pruned diff equals
# the direct full-table diff (which is exactly what the oracle runs).
# ---------------------------------------------------------------------------
@query(
    "q246_replica_repair",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), b_rows AS (
      SELECT o_orderkey,
             cents + CASE WHEN o_orderkey % 991 = 7 THEN 1 ELSE 0 END
               AS cents
      FROM base WHERE o_orderkey % 997 <> 13
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderkey IS NULL THEN 'added'
                ELSE 'changed' END AS status,
           a.cents AS cents_a, b.cents AS cents_b
    FROM base a FULL OUTER JOIN b_rows b ON a.o_orderkey = b.o_orderkey
    WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
       OR a.cents <> b.cents
    """,
)
def q246_replica_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level replica diff restricted to the checksum-divergent
    buckets: locate via q243's per-bucket checksums, then full-outer
    join only the pruned rows."""
    base = spark.table("orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    replica = base.where(F.col("o_orderkey") % 997 != 13).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") % 991 == 7, 1).otherwise(0)
        ).alias("cents"),
    )
    diff_buckets = (
        q243_partition_checksums(spark, sf_dir)
        .where(F.col("is_match") == 0)
        .select("bucket")
    )

    def prune(df: DataFrame) -> DataFrame:
        return df.join(
            F.broadcast(diff_buckets),
            (F.col("o_orderkey") % 64) == F.col("bucket"),
            "left_semi",
        )

    a = prune(base).alias("a")
    b = prune(replica).alias("b")
    ka, kb = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    return (
        a.join(b, ka == kb, "full")
        .where(
            kb.isNull()
            | ka.isNull()
            | (F.col("a.cents") != F.col("b.cents"))
        )
        .select(
            F.coalesce(ka, kb).alias("o_orderkey"),
            F.when(kb.isNull(), "removed")
            .when(ka.isNull(), "added")
            .otherwise("changed")
            .alias("status"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental rollup refresh (operators/incremental.py) — merge a
# historical per-customer aggregate STATE with a fresh delta partition
# WITHOUT rescanning history: both sides pre-aggregate to key grain,
# then one union + hash re-aggregation merges the algebraic partials
# (counts/sums by SUM, extrema by MIN/MAX); AVG derives after. The
# oracle recomputes from the full fact table — the merged state must
# be indistinguishable from a cold rebuild.
# ---------------------------------------------------------------------------
@query(
    "q244_incremental_rollup",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                AS BIGINT) AS first_day,
           CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                AS BIGINT) AS last_day,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / COUNT(*) AS avg_cents
    FROM orders GROUP BY 1
    """,
)
def q244_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order rollup refreshed incrementally: state (orders
    before 1999) merged with delta (1999 onward) via algebraic
    partial-aggregate merge, equal to a full rebuild."""
    from pandas_td_spark.operators.incremental import merge_agg_states

    orders = spark.table("orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day"),
    )
    cut = F.to_date(F.col("o_orderdate")) < F.lit("1999-01-01")

    def state_of(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )

    historical = state_of(
        orders.where(
            F.datediff(
                F.to_date(F.lit("1999-01-01")), F.lit("1970-01-01")
            ).cast("bigint")
            > F.col("day")
        )
    )
    delta = state_of(
        orders.where(
            F.datediff(
                F.to_date(F.lit("1999-01-01")), F.lit("1970-01-01")
            ).cast("bigint")
            <= F.col("day")
        )
    )
    merged = merge_agg_states(
        [historical, delta],
        keys=["o_custkey"],
        spec={
            "n_orders": "count",
            "sum_cents": "sum",
            "first_day": "min",
            "last_day": "max",
        },
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        "sum_cents",
        "first_day",
        "last_day",
        (F.col("sum_cents").cast("double") / F.col("n_orders")).alias(
            "avg_cents"
        ),
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier) — parts no other part beats on BOTH
# price (lower is better) and size (higher is better). The sort-based
# formulation: collapse to price grain (max size per price), take the
# STRICT prefix-max of size over ascending price on the distributed
# exclusive prefix operator, keep prices whose max size exceeds every
# strictly-cheaper price's, then re-attach the part rows by broadcast.
# The oracle is the quadratic NOT EXISTS dominance definition — the
# prefix form must match it exactly. No all-pairs anywhere in the
# Spark plan: cost is one price-grain aggregation + the two-phase
# prefix max + a broadcast join.
# ---------------------------------------------------------------------------
@query(
    "q245_skyline",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT a.p_partkey, a.cents, a.size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.cents <= a.cents AND b.size >= a.size
        AND (b.cents < a.cents OR b.size > a.size)
    )
    """,
)
def q245_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/size Pareto frontier of parts via distributed strict
    prefix-max over ascending price."""
    from pandas_td_spark.operators.ranking import with_global_prefix_agg

    p = spark.table("part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    g = p.groupBy("cents").agg(F.max("size").alias("msize"))
    gg = with_global_prefix_agg(
        g, ["cents"], "msize", agg="max", out="prev_max", inclusive=False
    )
    frontier = gg.where(
        F.col("msize") > F.coalesce(F.col("prev_max"), F.lit(-1))
    ).select(F.col("cents").alias("f_cents"), "msize")
    return p.join(
        F.broadcast(frontier),
        (p["cents"] == F.col("f_cents")) & (p["size"] == F.col("msize")),
    ).select("p_partkey", "cents", "size")


# ---------------------------------------------------------------------------
# Erasure cascade (GDPR/right-to-be-forgotten propagation) — given a
# tombstone set of customers, report per-table purge impact across the
# FK cascade (customer → orders → lineitem): rows purged, rows kept,
# and a fingerprint-sum checksum of the surviving keys (the artifact a
# deletion job publishes for downstream verification, same fingerprint
# family as the q243 anti-entropy checksums). Plan: the tombstone key
# set broadcasts into each fact scan as a left join + flag, so every
# table is read ONCE and both counts ride one aggregation; the purged
# order-key closure broadcasts into lineitem the same way. At 100 TB
# the closure can exceed broadcast size — the same plan degrades to a
# shuffle-hash semi-join without changing semantics (no driver state).
# ---------------------------------------------------------------------------
@query(
    "q251_erasure_cascade",
    oracle=f"""
    WITH tomb AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), cflag AS (
      SELECT c_custkey AS key,
             CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END AS purge
      FROM customer
    ), oflag AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_custkey IN (SELECT c_custkey FROM tomb)
                  THEN 1 ELSE 0 END AS purge
      FROM orders
    ), po AS (
      SELECT key AS o_orderkey FROM oflag WHERE purge = 1
    ), lflag AS (
      SELECT l_orderkey * 10 + l_linenumber AS key,
             CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
                  THEN 1 ELSE 0 END AS purge
      FROM lineitem
    ), u AS (
      SELECT 'customer' AS tbl, * FROM cflag
      UNION ALL SELECT 'orders', * FROM oflag
      UNION ALL SELECT 'lineitem', * FROM lflag
    )
    SELECT tbl,
           CAST(COALESCE(SUM(purge), 0) AS BIGINT) AS purged,
           CAST(COALESCE(SUM(1 - purge), 0) AS BIGINT) AS kept,
           CAST(COALESCE(SUM(CASE WHEN purge = 0 THEN
                  CAST(key * 1000003 % {_FP_MOD} AS HUGEINT) END)
                % {_FP_MOD}, 0) AS BIGINT) AS kept_fp
    FROM u GROUP BY tbl
    """,
    scale_note=(
        "tombstone set + purged-order closure broadcast into one-pass "
        "flagged scans (no second read per table); closure above "
        "broadcast size degrades to shuffle-hash semi-join"
    ),
)
def q251_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table purge/keep counts + surviving-key fingerprint for a
    customer tombstone set cascaded through orders to lineitem."""
    tomb = (
        spark.table("customer")
        .where(F.col("c_custkey") % 97 == 0)
        .select("c_custkey")
    )

    def flagged_agg(df: DataFrame, tbl: str) -> DataFrame:
        fp = (F.col("key") * 1000003) % _FP_MOD
        return df.agg(
            F.coalesce(F.sum("purge"), F.lit(0))
            .cast("bigint")
            .alias("purged"),
            F.coalesce(F.sum(1 - F.col("purge")), F.lit(0))
            .cast("bigint")
            .alias("kept"),
            F.coalesce(
                F.sum(
                    F.when(F.col("purge") == 0, fp).cast("decimal(38,0)")
                )
                % _FP_MOD,
                F.lit(0),
            )
            .cast("bigint")
            .alias("kept_fp"),
        ).select(F.lit(tbl).alias("tbl"), "purged", "kept", "kept_fp")

    cflag = spark.table("customer").select(
        F.col("c_custkey").alias("key"),
        F.when(F.col("c_custkey") % 97 == 0, 1).otherwise(0).alias("purge"),
    )
    oflag = (
        spark.table("orders")
        .join(
            F.broadcast(tomb),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(F.col("c_custkey").isNotNull(), 1).otherwise(0)
            .alias("purge"),
        )
    )
    po = oflag.where(F.col("purge") == 1).select(
        F.col("key").alias("po_key")
    )
    lflag = (
        spark.table("lineitem")
        .join(
            F.broadcast(po),
            F.col("l_orderkey") == F.col("po_key"),
            "left",
        )
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
            F.when(F.col("po_key").isNotNull(), 1).otherwise(0)
            .alias("purge"),
        )
    )
    return (
        flagged_agg(cflag, "customer")
        .unionByName(flagged_agg(oflag, "orders"))
        .unionByName(flagged_agg(lflag, "lineitem"))
    )


# ---------------------------------------------------------------------------
# Compaction planning (small-file bin-packing) — the maintenance job
# every lakehouse table needs: group many small files into target-size
# output bins, preserving sort order so the rewrite stays cluster-
# friendly. "Files" here are per-shipdate row groups (the natural
# ingest grain); the plan assigns each file to the bin its cumulative
# byte offset falls in (next-fit in date order — deterministic, and
# the exact algorithm Delta/Iceberg OPTIMIZE uses for sorted
# compaction). The cumulative offset is the distributed two-phase
# prefix sum (operators/ranking.py), never a single-partition window.
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 262144  # 256 KiB bins at 128 B/row


@query(
    "q252_compaction_plan",
    oracle=f"""
    WITH f AS (
      SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS dkey,
             CAST(COUNT(*) AS BIGINT) * 128 AS bytes
      FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
    ), c AS (
      SELECT dkey, bytes,
             CAST(COALESCE(SUM(bytes) OVER (
               ORDER BY dkey ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM f
    )
    SELECT CAST(off // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(dkey) AS first_key, MAX(dkey) AS last_key
    FROM c GROUP BY 1
    """,
    scale_note=(
        "file inventory is metadata-grain (one row per file, never per "
        "data row); the only global order is the distributed two-phase "
        "prefix sum over that bounded inventory"
    ),
)
def q252_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit compaction bins over per-shipdate file sizes via the
    distributed strict prefix sum."""
    from pandas_td_spark.operators.ranking import with_global_prefix_agg

    f = (
        spark.table("lineitem")
        .where(F.col("l_shipdate").isNotNull())
        .groupBy(
            F.unix_timestamp(F.col("l_shipdate"))
            .cast("bigint")
            .alias("dkey")
        )
        .agg((F.count("*") * 128).alias("bytes"))
    )
    g = with_global_prefix_agg(
        f, ["dkey"], "bytes", agg="sum", out="off", inclusive=False
    )
    binned = g.select(
        "dkey",
        "bytes",
        F.expr(
            f"cast(coalesce(off, 0) as bigint) div {_COMPACT_TARGET}"
        )
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bin_bytes"),
        F.min("dkey").alias("first_key"),
        F.max("dkey").alias("last_key"),
    )


# ---------------------------------------------------------------------------
# Zone-map file-skipping audit — quantifies what min/max file statistics
# (parquet row-group stats, Iceberg/Delta file-level zone maps) actually
# prune for a given physical layout. Files are month-partitioned orders
# (the time-partitioned ingest norm); per-file zone maps carry min/max
# of BOTH the clustered column (orderdate) and an unclustered one
# (totalprice). The audit evaluates one predicate against each map:
# a quarter range on orderdate (layout-aligned → prunes ~77/80 files)
# vs an equal-selectivity totalprice band (unaligned → prunes ~none) —
# the measurement behind every clustering decision (cf. q242's Morton
# profile). Plan: metadata-grain aggregation (one row per file), then a
# bounded two-row summary; the data is scanned exactly once.
# ---------------------------------------------------------------------------
_ZM_D_LO, _ZM_D_HI = 836179200, 844128000  # [1996-07-01, 1996-10-01) UTC
_ZM_P_LO, _ZM_P_HI = 100000.0, 150000.0


@query(
    "q253_zone_map_pruning",
    oracle=f"""
    WITH base AS (
      SELECT CAST(floor(epoch(date_trunc('month', o_orderdate)))
               AS BIGINT) AS file_id,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS d,
             o_totalprice AS p
      FROM orders
    ), z AS (
      SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(d) AS mn_d, MAX(d) AS mx_d,
             MIN(p) AS mn_p, MAX(p) AS mx_p,
             CAST(SUM(CASE WHEN d >= {_ZM_D_LO} AND d < {_ZM_D_HI}
                  THEN 1 ELSE 0 END) AS BIGINT) AS match_d,
             CAST(SUM(CASE WHEN p >= {_ZM_P_LO} AND p < {_ZM_P_HI}
                  THEN 1 ELSE 0 END) AS BIGINT) AS match_p
      FROM base GROUP BY 1
    ), audit AS (
      SELECT 'orderdate' AS pred,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(CASE WHEN mx_d < {_ZM_D_LO} OR mn_d >= {_ZM_D_HI}
                  THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
             CAST(SUM(CASE WHEN mx_d < {_ZM_D_LO} OR mn_d >= {_ZM_D_HI}
                  THEN 0 ELSE n END) AS BIGINT) AS rows_scanned,
             CAST(SUM(match_d) AS BIGINT) AS rows_match,
             CAST(SUM(n) AS BIGINT) AS rows_total
      FROM z
      UNION ALL
      SELECT 'totalprice',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN mx_p < {_ZM_P_LO} OR mn_p >= {_ZM_P_HI}
                  THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN mx_p < {_ZM_P_LO} OR mn_p >= {_ZM_P_HI}
                  THEN 0 ELSE n END) AS BIGINT),
             CAST(SUM(match_p) AS BIGINT),
             CAST(SUM(n) AS BIGINT)
      FROM z
    )
    SELECT * FROM audit
    """,
    scale_note=(
        "zone maps are metadata-grain (files, not rows): the audit "
        "aggregates the fact table once into per-file stats, then "
        "reduces a bounded file inventory — no second data scan"
    ),
)
def q253_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping effectiveness of month-partitioned zone maps for a
    layout-aligned date predicate vs an unaligned price predicate."""
    base = spark.table("orders").select(
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
        .cast("bigint")
        .alias("file_id"),
        F.unix_timestamp(F.col("o_orderdate")).cast("bigint").alias("d"),
        F.col("o_totalprice").alias("p"),
    )
    z = base.groupBy("file_id").agg(
        F.count("*").alias("n"),
        F.min("d").alias("mn_d"),
        F.max("d").alias("mx_d"),
        F.min("p").alias("mn_p"),
        F.max("p").alias("mx_p"),
        F.sum(
            F.when(
                (F.col("d") >= _ZM_D_LO) & (F.col("d") < _ZM_D_HI), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("match_d"),
        F.sum(
            F.when(
                (F.col("p") >= _ZM_P_LO) & (F.col("p") < _ZM_P_HI), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("match_p"),
    )

    def audit(pred: str, lo, hi, mn, mx, match) -> DataFrame:
        skip = (F.col(mx) < F.lit(lo)) | (F.col(mn) >= F.lit(hi))
        return z.agg(
            F.count("*").alias("n_files"),
            F.sum(F.when(skip, 1).otherwise(0))
            .cast("bigint")
            .alias("files_skipped"),
            F.sum(F.when(skip, 0).otherwise(F.col("n")))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum(match).cast("bigint").alias("rows_match"),
            F.sum("n").cast("bigint").alias("rows_total"),
        ).select(
            F.lit(pred).alias("pred"),
            "n_files",
            "files_skipped",
            "rows_scanned",
            "rows_match",
            "rows_total",
        )

    return audit(
        "orderdate", _ZM_D_LO, _ZM_D_HI, "mn_d", "mx_d", "match_d"
    ).unionByName(
        audit("totalprice", _ZM_P_LO, _ZM_P_HI, "mn_p", "mx_p", "match_p")
    )


# ---------------------------------------------------------------------------
# Out-of-order arrival audit (watermark sizing) — for an event stream
# consumed in arrival order (event_id), how late does event time lag
# the running high-water mark? The lateness histogram is exactly the
# evidence a streaming job needs to size its watermark
# (streaming/jobs.py's windowed aggregations drop events later than
# the chosen delay). The running max is the distributed two-phase
# prefix-max (operators/ranking.py) — arrival order is a total order
# (unique event_id), so ROWS and RANGE frames coincide.
# ---------------------------------------------------------------------------
@query(
    "q255_out_of_order_audit",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE ts IS NOT NULL
    ), m AS (
      SELECT t, MAX(t) OVER (
               ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS hi
      FROM e
    ), l AS (
      SELECT LEAST((hi - t) // 3600, 24) AS late_bucket_h,
             hi - t AS late_s
      FROM m
    )
    SELECT late_bucket_h,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(late_s) AS max_late_s
    FROM l GROUP BY 1
    """,
    scale_note=(
        "running high-water mark via the distributed two-phase "
        "prefix-max over arrival order; histogram reduction is keyed "
        "partial aggregation"
    ),
)
def q255_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness histogram vs the arrival-order high-water
    mark — the watermark-sizing audit."""
    from pandas_td_spark.operators.ranking import with_global_prefix_agg

    e = (
        spark.table("events")
        .where(F.col("ts").isNotNull())
        .select(
            F.col("event_id"),
            F.unix_timestamp(F.col("ts")).cast("bigint").alias("t"),
        )
    )
    m = with_global_prefix_agg(
        e, ["event_id"], "t", agg="max", out="hi", inclusive=True
    )
    late = F.col("hi") - F.col("t")
    l = m.select(
        F.least(F.expr("(hi - t) div 3600"), F.lit(24))
        .cast("bigint")
        .alias("late_bucket_h"),
        late.alias("late_s"),
    )
    return l.groupBy("late_bucket_h").agg(
        F.count("*").alias("n_events"),
        F.max("late_s").alias("max_late_s"),
    )


# ---------------------------------------------------------------------------
# E11 — snapshot row-level diff (round 9): the CDC primitive between two
# table states (yesterday's snapshot vs today's) — added / removed /
# changed / unchanged row sets plus the value delta per class. The two
# states derive deterministically from orders (state 1 = pre-1997
# cutoff; state 2 = pre-1998 with simulated corrections on keys % 97
# and simulated deletes on keys % 101), so the oracle states them
# identically. Scale shape: ONE full-outer sort-merge join on the key —
# both sides shuffle once (zero-shuffle when the snapshots are bucketed
# by key, the layout a CDC pipeline would choose), then a 4-group
# aggregate; never a row-by-row compare loop.
# ---------------------------------------------------------------------------
_DIFF_S1 = "o_orderdate < TIMESTAMP '1997-01-01'"
_DIFF_S2 = (
    "o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 101 <> 0"
)
#: prices ride as exact integer cents (o_totalprice is stored DOUBLE;
#: ROUND(x*100) recovers the true cents on both engines) and state 2
#: simulates corrections of +1.00 on keys % 97
_DIFF_CENTS1 = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_DIFF_CENTS2 = (
    "CAST(ROUND(o_totalprice * 100) AS BIGINT) + "
    "CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 0 END"
)


@query(
    "q268_snapshot_diff",
    oracle=f"""
    WITH s1 AS (
      SELECT o_orderkey AS k, {_DIFF_CENTS1} AS v FROM orders
      WHERE {_DIFF_S1}
    ), s2 AS (
      SELECT o_orderkey AS k, {_DIFF_CENTS2} AS v FROM orders
      WHERE {_DIFF_S2}
    ), d AS (
      SELECT COALESCE(s1.k, s2.k) AS k,
             CASE WHEN s1.k IS NULL THEN 'added'
                  WHEN s2.k IS NULL THEN 'removed'
                  WHEN s1.v <> s2.v THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(s2.v, 0) - COALESCE(s1.v, 0) AS delta
      FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(delta) AS BIGINT) AS delta_sum_cents
    FROM d GROUP BY status
    """,
)
def q268_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of two order-table snapshots: per-status row counts and
    exact integer-cent value deltas from one full-outer key join."""
    o = spark.table("orders")
    s1 = o.where(F.expr(_DIFF_S1)).select(
        F.col("o_orderkey").alias("k"), F.expr(_DIFF_CENTS1).alias("v1")
    )
    s2 = o.where(F.expr(_DIFF_S2)).select(
        F.col("o_orderkey").alias("k"), F.expr(_DIFF_CENTS2).alias("v2")
    )
    d = s1.join(s2, "k", "full_outer").select(
        F.when(F.col("v1").isNull(), "added")
        .when(F.col("v2").isNull(), "removed")
        .when(F.col("v1") != F.col("v2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (F.coalesce("v2", F.lit(0)) - F.coalesce("v1", F.lit(0))).alias(
            "delta"
        ),
    )
    return d.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        F.sum("delta").cast("bigint").alias("delta_sum_cents"),
    )
