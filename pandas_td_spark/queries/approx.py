"""Sketch & container aggregates (SURVEY.md §2.4 A3-A6, §2.8 array/map
scalar surface).

A3 (``approx_distinct``) is inherently engine-specific (HLL implementations
differ) → rows-only with an accuracy self-check in tests; A4 maps to
Spark's *exact* ``percentile`` which interpolates identically to DuckDB's
``quantile_cont`` (verified bit-equal) → full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.queries._util import dsum
from pandas_td_spark.queries.registry import query


# ---------------------------------------------------------------------------
# A3 — approx_count_distinct (HLL) — rows-only (engine-specific sketch)
# ---------------------------------------------------------------------------
@query("q70_approx_distinct", oracle=None)
def q70_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto ``approx_distinct(x[, e])`` analogue. HLL++ here vs Presto's
    HLL — estimates differ across engines by design, so no value oracle;
    tests assert relative error ≤ 5% vs exact (rsd 0.02 balances sketch
    size vs accuracy).

    Plan (r12): dedup (flag, partkey) FIRST, then run BOTH aggregates on
    the distinct pairs — an HLL sketch is duplicate-insensitive, so the
    estimate is bit-identical to sketching the raw stream, while the
    mixed distinct+non-distinct form it replaces planned an Expand (2x
    the scan) through a 4-exchange two-phase distinct rewrite. Now: one
    map-side-combined distinct exchange + one 3-row final agg (1.2 ->
    ~0.6 s warm at sf0.1); the same shape a 100 TB run wants, since the
    distinct exchange carries |distinct pairs|, not the fact stream."""
    li = spark.table("lineitem")
    # NULL partkeys must not count: countDistinct (the pre-r12 form) and
    # the HLL sketch both skip NULL, so the distinct-pairs count(*) has
    # to filter it explicitly or exact_parts drifts +1 on NULL-bearing
    # input (r12 review)
    pairs = (
        li.select("l_returnflag", "l_partkey")
        .where(F.col("l_partkey").isNotNull())
        .distinct()
    )
    return pairs.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# A4 — exact percentiles (interpolating, = DuckDB quantile_cont)
# ---------------------------------------------------------------------------
@query(
    "q71_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def q71_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` surface backed by Spark's exact ``percentile``
    (same linear interpolation as quantile_cont — verified bit-equal).
    ``F.percentile_approx`` exists for the sketch path at 100 TB; exact
    percentile is a full sort per group, acceptable per-group volumes only."""
    o = spark.table("orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.50).alias("p50"),
        F.percentile("o_totalprice", 0.90).alias("p90"),
    )


# ---------------------------------------------------------------------------
# A5 — collect_set / array_agg (sorted for determinism)
# ---------------------------------------------------------------------------
@query(
    "q72_collect_set",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
               AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY o_custkey
    """,
)
def q72_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``array_agg``/``collect_set`` — sorted before surfacing (aggregation
    order is nondeterministic in every engine), then serialized to a
    ','-joined string: the driver's canonicalizer hashes scalar cells only
    (round-1 red row was ``TypeError: unhashable type: 'list'`` on the raw
    array column, not an engine mismatch)."""
    o = spark.table("orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# A6 — map_agg: build map per group, extract scalars (MapType exercised,
# scalar outputs keep the oracle comparison engine-neutral)
# ---------------------------------------------------------------------------
@query(
    "q73_map_agg",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), m AS (
      SELECT user_id, map_from_entries(list({'k': event_type, 'v': c})) AS counts
      FROM per_type GROUP BY user_id
    )
    SELECT user_id,
           COALESCE((counts['click'])[1], 0)    AS clicks,
           COALESCE((counts['purchase'])[1], 0) AS purchases,
           CAST(cardinality(counts) AS BIGINT) AS n_types
    FROM m
    """,
)
def q73_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto ``map_agg(k, v)`` idiom (SURVEY §2.4 A6):
    map_from_entries(collect_list(struct(k, v)))."""
    ev = spark.table("events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))
        ).alias("counts")
    )
    return m.select(
        "user_id",
        F.coalesce(F.element_at("counts", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("counts", "purchase"), F.lit(0)).alias(
            "purchases"
        ),
        F.size("counts").cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# §2.8 array scalar surface: higher-order functions end-to-end
# ---------------------------------------------------------------------------
@query(
    "q74_array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN)
               AS has_spark,
           array_to_string((string_split(text, ' '))[1:3], '|') AS first3,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> length(w) > 5)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> length(w))) AS BIGINT)
               AS total_len
    FROM documents
    """,
)
def q74_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate (Presto reduce) / slice / contains —
    the higher-order function family, all JVM-side."""
    d = spark.table("documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws("|", F.slice(words, 1, 3)).alias("first3"),
        F.size(F.filter(words, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("n_long"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.length(w).cast("bigint"),
        ).alias("total_len"),
    )
