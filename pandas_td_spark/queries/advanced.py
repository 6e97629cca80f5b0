"""Advanced operators: as-of join (J10), range join (J9), multimodal
featurization (L5/L6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.operators.asof import asof_join
from pandas_td_spark.operators.multimodal import featurize_binary, with_media_meta
from pandas_td_spark.queries.registry import query


# ---------------------------------------------------------------------------
# J10 — as-of join: each purchase ↔ most recent prior click (per user)
# ---------------------------------------------------------------------------
@query(
    "q60_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           c.value AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q60_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed as-of join (union + last-ignorenulls window; see
    operators/asof.py) vs DuckDB's native ASOF LEFT JOIN — same backward-
    inclusive semantics."""
    ev = spark.table("events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, by="user_id", left_on="ts", value_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts_asof").cast("bigint").alias("click_epoch"),
        F.col("value_asof").alias("click_value"),
    )


# ---------------------------------------------------------------------------
# J9 — range join: lineitems bucketed into generated month intervals
# ---------------------------------------------------------------------------
@query(
    "q61_range_join",
    oracle="""
    WITH months AS (
      SELECT CAST(gs AS TIMESTAMP) AS m_start,
             CAST(gs AS TIMESTAMP) + INTERVAL 1 MONTH AS m_end
      FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-12-01',
                           INTERVAL 1 MONTH) AS t(gs)
    )
    SELECT CAST(floor(epoch(m_start)) AS BIGINT) AS month_epoch,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
    FROM lineitem JOIN months
      ON l_shipdate >= m_start AND l_shipdate < m_end
    GROUP BY 1
    """,
)
def q61_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join against a generated dimension. The month
    side is tiny → broadcast nested loop is the right plan; for two large
    interval sets, bucketize both sides to turn it into an equi-join
    (documented limitation, SURVEY §2.3 J9)."""
    months = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("timestamp"),
                    F.lit("2001-12-01").cast("timestamp"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias("m_start")
        )
        .withColumn("m_end", F.col("m_start") + F.expr("INTERVAL 1 MONTH"))
    )
    li = spark.table("lineitem").repartition(32)  # parallelize BNLJ stream side
    from pandas_td_spark.queries._util import dsum

    return (
        li.join(
            F.broadcast(months),
            (F.col("l_shipdate") >= F.col("m_start"))
            & (F.col("l_shipdate") < F.col("m_end")),
        )
        .groupBy(
            F.unix_timestamp("m_start").cast("bigint").alias("month_epoch")
        )
        .agg(F.count("*").alias("n_lines"), dsum("l_quantity").alias("qty"))
    )


# ---------------------------------------------------------------------------
# L5 — multimodal metadata + stub featurization (rows-only: stub decode)
# ---------------------------------------------------------------------------
@query("q62_multimodal_features", oracle=None)
def q62_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text→bytes payload (stand-in for image/audio
    blobs), JVM-side metadata struct, then Arrow-batched mapInPandas
    featurization (STUB decoder — deterministic fake; real codecs plug into
    the same signature). Returns (doc_id, n_bytes, format, feature dim)."""
    d = spark.table("documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    d = with_media_meta(d, "payload")
    feats = featurize_binary(d, payload="payload", id_col="doc_id", out_dim=16)
    return (
        d.select("doc_id", "media_meta.n_bytes", "media_meta.format")
        .join(feats, "doc_id")
        .select(
            "doc_id",
            "n_bytes",
            "format",
            F.size("feature").cast("bigint").alias("feat_dim"),
        )
    )


# ---------------------------------------------------------------------------
# J9 (large×large) — bucketized point-in-interval join, no broadcast side
# ---------------------------------------------------------------------------
@query(
    "q76_interval_join_large",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    )
    SELECT e.event_id AS error_id, p.event_id AS purchase_id,
           p.user_id AS purchase_user, p.t - e.t AS lag_s
    FROM ev e JOIN ev p
      ON p.t >= e.t AND p.t < e.t + 5
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    """,
)
def q76_interval_join_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 without a broadcastable side: every purchase within 5 s after any
    error, via operators/interval.py::point_in_interval_join — both inputs
    are corpus-sized event streams (~20k rows each at sf0.1, and growing
    with the data), so the q61-style BroadcastNestedLoopJoin is not an
    option. The plan is a shuffle equi-join on 5 s time buckets; DuckDB's
    oracle runs the same join as a native inequality (IEJoin) join."""
    from pandas_td_spark.operators.interval import point_in_interval_join

    ev = spark.table("events").select(
        "event_id",
        "event_type",
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("t"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("t").alias("w_start"),
        (F.col("t") + 5).alias("w_end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("t").alias("p_t"),
    )
    return point_in_interval_join(
        purchases, errors, "p_t", "w_start", "w_end", bucket_width=5
    ).select(
        "error_id",
        "purchase_id",
        "purchase_user",
        (F.col("p_t") - F.col("w_start")).alias("lag_s"),
    )
