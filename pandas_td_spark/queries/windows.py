"""Window-function coverage (SURVEY.md §2.5 W1-W6, §2.8 F8 sessionize).

The reference delegated all window SQL to Presto; TD workflows leaned on
per-key ranking (``TD_X_RANK``) and gap-based sessionization
(``td_sessionize``, deprecated upstream). Both are expressed here as native
Spark window plans — a single hash-partition shuffle per window spec, sort
within partitions, no driver involvement.

Determinism notes: every ORDER BY inside a window carries a unique
tie-breaker column; running/sliding sums go through the decimal-exact
pattern (queries/_util.py); frames are spelled explicitly (ROWS, not the
default RANGE) so peer-row semantics cannot diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_td_spark.queries.registry import query


# ---------------------------------------------------------------------------
# W1 — ranking: per-customer top-3 orders (TD_X_RANK analogue)
# ---------------------------------------------------------------------------
@query(
    "q20_window_topk_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q20_window_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: rank-and-filter — the scalable alternative to
    per-key sorts; one shuffle on the partition key."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# W2 — lag/lead: per-user deltas between consecutive events
# ---------------------------------------------------------------------------
@query(
    "q21_window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def q21_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = spark.table("events")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# W4/W5 — running aggregate with explicit ROWS frame
# ---------------------------------------------------------------------------
@query(
    "q22_window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def q22_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return spark.table("orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# W5 — sliding ROWS frame: 5-row moving average per user
# ---------------------------------------------------------------------------
@query(
    "q23_window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q23_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    ev = spark.table("events")
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# W3 — first_value / last_value / nth_value over full-partition frame
# ---------------------------------------------------------------------------
@query(
    "q24_window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q24_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# W1 — distribution ranks: ntile / percent_rank / cume_dist / dense_rank
# ---------------------------------------------------------------------------
@query(
    "q25_window_distribution",
    oracle="""
    SELECT s_suppkey,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume,
           DENSE_RANK()   OVER w AS drank
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
)
def q25_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (unpartitioned) window — single-partition sort; acceptable
    only on small dims. The runtime guard (plans/guards.py) warns when the
    input's size estimate says this stopped being a dim table."""
    from pandas_td_spark.plans.guards import warn_if_global_window_input_large

    w = W.orderBy("s_acctbal", "s_suppkey")
    return warn_if_global_window_input_large(spark.table("supplier")).select(
        "s_suppkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
    )


# ---------------------------------------------------------------------------
# F8 — td_sessionize batch idiom: cumulative-gap session ids per user
# ---------------------------------------------------------------------------
@query(
    "q26_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id)))
                            AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id,
           CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def q26_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """td_sessionize (SURVEY §2.8 F8): 30-min-gap sessions counted per user.

    Cumulative-gap idiom — one window shuffle on user_id, then a grouped
    count; the same plan shape sessionizes 100 TB (state bounded per key).
    The streaming twin is streaming/jobs.py::sessionized_counts.
    """
    from pandas_td_spark.operators.sessionize import with_session_id

    ev = spark.table("events")
    sess = with_session_id(
        ev, key="user_id", ts_col="ts", timeout_sec=1800, order_cols=["event_id"]
    )
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# T4-adjacent — batch session_window (start/end/gap semantics)
# ---------------------------------------------------------------------------
@query(
    "q27_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_id
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(MAX(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def q27_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` in batch mode — window end = last event
    + gap; a new session starts when the inter-event gap is >= the timeout
    (mirrored exactly in the oracle's cumulative-gap emulation)."""
    ev = spark.table("events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start")
            .cast("bigint")
            .alias("session_start"),
            F.unix_timestamp("session_window.end")
            .cast("bigint")
            .alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# pivot — event-type counts per user (reference magics' --pivot analogue)
# ---------------------------------------------------------------------------
@query(
    "q28_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — without it Spark runs an extra
    distinct job to discover values (a full scan at 100 TB)."""
    return (
        spark.table("events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


# ---------------------------------------------------------------------------
# W5 — RANGE frame (value-based window, the other half of frame specs)
# ---------------------------------------------------------------------------
@query(
    "q68_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS nearby_total,
           COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS nearby_n
    FROM orders
    """,
)
def q68_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers defined by ORDER BY *value* distance (here: all
    of a customer's orders within 10k price below), not row position —
    deterministic without tie-breakers because the frame is value-closed.
    rangeBetween requires a single numeric ORDER BY expression in both
    engines. Partition key is o_custkey (|customers| scales with the data):
    round 1 keyed this demo by o_orderstatus — 3 distinct values — which
    sorts the whole table into 3 window partitions, a parallelism ceiling
    no cluster size can lift (11 s of the sf0.1 bench on its own)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("nearby_total"),
        F.count("*").over(w).alias("nearby_n"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection — per-user trailing-window mean/std
# (ROWS 20 PRECEDING..1 PRECEDING so the current row never contaminates its
# own baseline), flag |z| > 2. One window shuffle on user_id; moments come
# from decimal-exact sum/sumsq so both engines compute bit-identical
# doubles (the _util.py discipline applied to variance). The composite
# epoch*10^7+event_id order key makes frames tie-free.
# ---------------------------------------------------------------------------
@query(
    "q114_rolling_zscore",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER fr AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER fr AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER fr
                  AS DOUBLE) AS s2
      FROM events
      WINDOW fr AS (
        PARTITION BY user_id
        ORDER BY CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, value,
           round((value - s / n)
                 / sqrt((s2 - s * s / n) / (n - 1)), 6) AS z
    FROM w
    WHERE n >= 5 AND (s2 - s * s / n) / (n - 1) > 0
      AND abs((value - s / n)
              / sqrt((s2 - s * s / n) / (n - 1))) > 2
    """,
)
def q114_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score outliers per user: decimal-exact moments,
    baseline excludes the current row, |z| > 2."""
    e = spark.table("events")
    key = (
        F.unix_timestamp("ts").cast("bigint") * F.lit(10000000)
        + F.col("event_id")
    )
    fr = (
        W.partitionBy("user_id").orderBy(key).rowsBetween(-20, -1)
    )
    v = F.col("value")
    w = e.select(
        "user_id", "event_id", "value",
        F.count("value").over(fr).alias("n"),
        F.sum(v.cast("decimal(28,6)")).over(fr).cast("double").alias("s"),
        F.sum((v * v).cast("decimal(28,6)")).over(fr).cast("double")
        .alias("s2"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (v - F.col("s") / F.col("n")) / F.sqrt(var)
    return (
        w.where((F.col("n") >= 5) & (var > 0) & (F.abs(z) > 2))
        .select("user_id", "event_id", "value", F.round(z, 6).alias("z"))
    )


# ---------------------------------------------------------------------------
# Running peak / maximum drawdown per user over the cumulative value
# series — the risk-analytics window composition (cumsum → running max →
# max gap), all three windows sharing ONE partition spec so Spark sorts
# each user partition exactly once.
# ---------------------------------------------------------------------------
@query(
    "q126_max_drawdown",
    oracle="""
    WITH cumulative AS (
      SELECT user_id, ts, event_id,
             SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS cum
      FROM events
    ), series AS (
      SELECT user_id, cum,
             MAX(cum) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS peak
      FROM cumulative
    )
    SELECT user_id,
           ROUND(MAX(peak - cum), 6) AS max_drawdown,
           ROUND(MAX(peak), 6) AS peak_value
    FROM series GROUP BY user_id
    """,
)
def q126_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of each user's cumulative value stream: three stacked
    windows over the same (user, time) ordering collapse to a single
    sort within one shuffle."""
    e = spark.table("events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = F.sum("value").over(w)
    peak = F.max(cum).over(w)
    return (
        e.select(
            "user_id",
            cum.alias("cum"),
            peak.alias("peak"),
        )
        .groupBy("user_id")
        .agg(
            F.round(F.max(F.col("peak") - F.col("cum")), 6).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak"), 6).alias("peak_value"),
        )
    )


# ---------------------------------------------------------------------------
# Session METRICS — the composition on top of sessionize (q26 counts
# sessions; this aggregates at session grain first): per-user session
# count, mean duration, mean events/session. Same single (user, time)
# shuffle; the extra grain is a hash aggregate on (user, session_id).
# ---------------------------------------------------------------------------
@query(
    "q147_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
      FROM flagged
    ), per_session AS (
      SELECT user_id, sid,
             CAST(floor(epoch(MAX(ts))) AS BIGINT)
               - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS dur_s,
             COUNT(*) AS n_ev
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(dur_s), 6) AS avg_duration_s,
           ROUND(AVG(CAST(n_ev AS DOUBLE)), 6) AS avg_events
    FROM per_session GROUP BY user_id
    """,
)
def q147_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session metrics off the sessionize operator output:
    session-grain aggregate, then user-grain rollup."""
    from pandas_td_spark.operators.sessionize import with_session_id

    ev = spark.table("events")
    sess = with_session_id(
        ev, key="user_id", ts_col="ts", timeout_sec=1800,
        order_cols=["event_id"],
    )
    t = F.unix_timestamp("ts").cast("bigint")
    per_session = sess.groupBy("user_id", "session_id").agg(
        (F.max(t) - F.min(t)).alias("dur_s"),
        F.count("*").alias("n_ev"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("dur_s"), 6).alias("avg_duration_s"),
        F.round(F.avg(F.col("n_ev").cast("double")), 6).alias("avg_events"),
    )


# ---------------------------------------------------------------------------
# Funnel latency — time from each user's FIRST view to FIRST purchase
# (only users who converted after viewing): two filtered min aggregates
# in one pass, then percentile fences over the per-user latencies.
# ---------------------------------------------------------------------------
@query(
    "q148_funnel_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_buy
      FROM events GROUP BY user_id
    ), lat AS (
      SELECT t_buy - t_view AS latency_s FROM firsts
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(AVG(latency_s), 6) AS mean_latency_s,
           ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
           ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s
    FROM lat
    """,
)
def q148_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view→first-purchase latency distribution — filtered min
    aggregates in one scan, exact percentiles over the per-user grain."""
    e = spark.table("events")
    t = F.unix_timestamp("ts").cast("bigint")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", t)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("t_buy"),
    )
    lat = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).alias("latency_s"))
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.avg("latency_s"), 6).alias("mean_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias(
            "p50_latency_s"
        ),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias(
            "p90_latency_s"
        ),
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE frame — trailing 1-hour sums per user. Both
# engines frame over INTEGER MICROSECOND epochs: an earlier form framed
# Spark on floor-second epochs against the oracle's native
# INTERVAL-on-timestamp frame, and a sub-second-precision event at
# t-3600.4s landed inside Spark's truncated frame but outside DuckDB's
# full-precision one (first seen at sf0.1 — sf0.01's sparser per-user
# streams never put an event on the boundary). Peer rows (equal µs) are
# included by both — the semantics RANGE exists for.
# ---------------------------------------------------------------------------
@query(
    "q168_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS hour_sum,
           CAST(COUNT(*) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS hour_n
    FROM events
    """,
)
def q168_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour value sum/count per user via a RANGE frame keyed on
    epoch microseconds — sliding time windows without self-joins."""
    e = spark.table("events")
    # ts arrives TIMESTAMP or TIMESTAMP_NTZ depending on the source
    # path (r3's ntz lesson); the cast is a no-op for TIMESTAMP and
    # pins NTZ to the UTC session zone — unix_micros requires TIMESTAMP
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(t)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
        F.count("*").over(w).cast("bigint").alias("hour_n"),
    )


# ---------------------------------------------------------------------------
# Rank-flavor parity (W17) — row_number vs rank vs dense_rank vs
# percent_rank on one tied ordering, side by side: the window-semantics
# certification for the rank family on ties. percent_rank is
# (rank-1)/(n-1) — an exact integer ratio, identical doubles both
# engines. Tie grain: quantity within returnflag (25 distinct values →
# heavy, deterministic ties).
# ---------------------------------------------------------------------------
@query(
    "q227_rank_flavors",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem WHERE l_quantity <= 25 GROUP BY 1, 2
    )
    SELECT l_returnflag, q, cnt,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk
    FROM g
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY cnt DESC, q)
    """,
)
def q227_rank_flavors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four rank flavors over the same deterministic tied ordering
    (count-of-quantity cells per returnflag)."""
    from pyspark.sql import Window as W

    g = (
        spark.table("lineitem")
        .where(F.col("l_quantity") <= 25)
        .groupBy(
            "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), "q")
    return g.select(
        "l_returnflag",
        "q",
        "cnt",
        # Spark rank fns are int32; DuckDB's are BIGINT — pin the width
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
    )
