"""TD UDF-surface coverage (SURVEY.md §2.8 F1-F7, P2, S1).

These exercise the ``pandas_td_spark.functions.td`` library — the signature
function family of the reference ecosystem (the client generated
``td_time_range`` in ``pandas_td/td.py::read_td_table``; the rest were
server-side TD UDFs its users wrote — loci UNVERIFIED, /root/reference
empty). The epoch `time` column is derived from ``events.ts`` per
FIXTURES.md. Oracle endpoints are precomputed to epoch literals with the
same driver-side normalization the Spark path uses, so both engines compare
identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.functions.td import (
    td_date_trunc,
    td_interval,
    td_time_add,
    td_time_format,
    td_time_range,
    to_epoch_seconds,
)
from pandas_td_spark.queries._util import dsum
from pandas_td_spark.queries.registry import query

_START = to_epoch_seconds("2024-01-10")  # 1704844800
_END = to_epoch_seconds("2024-01-20")  # 1705708800
_NOW = to_epoch_seconds("2024-01-31")


def _events_with_time(spark: SparkSession) -> DataFrame:
    """TD data model adapter: mandatory epoch-seconds `time` column."""
    return spark.table("events").withColumn(
        "time", F.unix_timestamp("ts").cast("bigint")
    )


# ---------------------------------------------------------------------------
# F1/P2/S1 — td_time_range scan predicate
# ---------------------------------------------------------------------------
@query(
    "q30_td_time_range",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS time FROM events)
    WHERE time >= {_START} AND time < {_END}
    GROUP BY event_type
    """,
)
def q30_td_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[start, end) time-slice + aggregate — the reference's core scan
    pattern (read_td_table(time_range=...))."""
    ev = _events_with_time(spark)
    return (
        ev.where(td_time_range("time", "2024-01-10", "2024-01-20"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# F2 — td_time_format (strftime dialect) → hourly activity profile
# ---------------------------------------------------------------------------
@query(
    "q31_td_time_format",
    oracle="""
    SELECT strftime(ts AT TIME ZONE 'UTC', '%Y-%m-%d %H') AS hour_str,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q31_td_time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ruby-strftime format translated to a Spark pattern driver-side
    (functions/td.py::strftime_to_spark)."""
    ev = _events_with_time(spark)
    return ev.groupBy(
        td_time_format("time", "%Y-%m-%d %H").alias("hour_str")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# F4 — td_date_trunc: daily rollup on the epoch column
# ---------------------------------------------------------------------------
@query(
    "q32_td_date_trunc",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_value
    FROM events GROUP BY 1
    """,
)
def q32_td_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_with_time(spark)
    return ev.groupBy(
        td_date_trunc("day", "time").alias("day_epoch")
    ).agg(F.count("*").alias("n"), dsum("value").alias("day_value"))


# ---------------------------------------------------------------------------
# F5 — td_time_add: shifted epochs projected per event
# ---------------------------------------------------------------------------
@query(
    "q33_td_time_add",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) + 86400 AS next_day,
           CAST(floor(epoch(ts)) AS BIGINT) - 3600  AS hour_before
    FROM events
    """,
)
def q33_td_time_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_with_time(spark)
    return ev.select(
        "event_id",
        td_time_add("time", "1d").alias("next_day"),
        td_time_add("time", "-1h").alias("hour_before"),
    )


# ---------------------------------------------------------------------------
# F6 — td_interval: trailing-7d window relative to a pinned `now`
# ---------------------------------------------------------------------------
@query(
    "q34_td_interval",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_recent
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS time FROM events)
    WHERE time >= {_NOW - 7 * 86400} AND time < {_NOW}
    GROUP BY user_id
    """,
)
def q34_td_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative window with an explicit pinned `now` (determinism — SURVEY
    §7 risks; the reference resolved now() server-side at job start)."""
    ev = _events_with_time(spark)
    return (
        ev.where(td_interval("time", "-7d", now="2024-01-31"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_recent"))
    )


# ---------------------------------------------------------------------------
# F1 via SQL surface — registered td_time_range used in raw SQL text
# ---------------------------------------------------------------------------
@query(
    "q35_td_sql_surface",
    oracle=f"""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS time FROM events)
    WHERE time >= {_START} AND time < {_END}
    GROUP BY event_type
    """,
)
def q35_td_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text path (read_td_query parity): registered td_time_range
    SQL function inside a plain spark.sql string."""
    _events_with_time(spark).createOrReplaceTempView("events_td")
    return spark.sql(
        """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events_td
        WHERE td_time_range(time, '2024-01-10', '2024-01-20')
        GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# JSON payload path (schemaless `props` — SURVEY §7 risk)
# ---------------------------------------------------------------------------
@query(
    "q36_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS bucket_value
    FROM events GROUP BY 1
    """,
)
def q36_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON `props` string (TD's semi-structured
    record model): get_json_object + cast, grouped."""
    ev = spark.table("events")
    return (
        ev.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("bigint") % 10),
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value").alias("bucket_value"))
    )


# ---------------------------------------------------------------------------
# Scalar-function surface sampler (SURVEY §2.8 standard scalars)
# ---------------------------------------------------------------------------
@query(
    "q37_scalar_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_brand, 7) AS brand_num,
           CONCAT(p_type, ':', CAST(p_size AS VARCHAR)) AS type_size,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
           ROUND(p_retailprice) AS price_round,
           ABS(p_size - 25) AS size_dist,
           COALESCE(NULLIF(p_brand, 'Brand#1'), 'BASE') AS brand_or_base
    FROM part
    """,
)
def q37_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_brand", 7, 2147483647).alias("brand_num"),
        F.concat_ws(":", F.col("p_type"), F.col("p_size").cast("string")).alias(
            "type_size"
        ),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.round("p_retailprice").alias("price_round"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("BASE")).alias(
            "brand_or_base"
        ),
    )


# ---------------------------------------------------------------------------
# Date-function surface on TIMESTAMP columns
# ---------------------------------------------------------------------------
@query(
    "q38_date_functions",
    oracle="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS month_total
    FROM orders
    GROUP BY 1, 2
    """,
)
def q38_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m")
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("month_total"),
        )
    )


# ---------------------------------------------------------------------------
# F7 — td_scheduled_time(): session-pinned scheduled execution time
# ---------------------------------------------------------------------------
_SCHED = 1705708800  # 2024-01-20T00:00:00Z — pinned-literal oracle twin


@query(
    "q75_td_scheduled_time",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS time FROM events)
    WHERE time >= {_SCHED} - 604800 AND time < {_SCHED}
    GROUP BY event_type
    """,
)
def q75_td_scheduled_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: ``TD_SCHEDULED_TIME()`` as a session-parameterized SQL function
    (reference: ``TD_SCHEDULED_TIME`` UDF, scheduled-run semantics;
    UNVERIFIED — /root/reference is empty). ``set_scheduled_time`` pins the
    session variable exactly as TD's scheduler pins a run's time; the
    trailing-7-day window below is the canonical incremental-job pattern.
    The pinned value constant-folds (analyzer-inlined function over a
    session variable), so the time predicate still pushes down to the scan."""
    from pandas_td_spark.functions.td import set_scheduled_time

    set_scheduled_time(spark, _SCHED)
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n
        FROM (SELECT *, unix_timestamp(ts) AS time FROM events)
        WHERE time >= td_scheduled_time() - 604800
          AND time <  td_scheduled_time()
        GROUP BY event_type
        """
    )
