"""Relational operator coverage (SURVEY.md §2.1-2.4, §2.6-2.7).

Each query is the *library-level* demonstration of one operator family,
registered with a DuckDB oracle. The reference delegated all of these to
Presto/Hive as SQL text (pandas_td/td.py::read_td_query — UNVERIFIED,
/root/reference empty); here they are declarative DataFrame plans that
Catalyst compiles to pushed-down scans, broadcast/sort-merge joins and
partial+final hash aggregates.

Float determinism: see queries/_util.py (decimal-exact sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.queries._util import bmax, bsum, bval, dsum
from pandas_td_spark.queries.registry import query

_SHIP_CUTOFF = "1998-09-02 00:00:00"


def _rev():
    """l_extendedprice * (1 - l_discount): the TPC-H revenue expression —
    an exact 4-decimal-place value (2-dp price x 2-dp discount factor;
    contracts fixture-verified), summed via ``bsum(_rev(), 4)`` with a
    lockstep FLOOR(.. * 10000 + 0.5)::BIGINT oracle since r15 (guide §1.2:
    dsum's decimal(28,6) buffers were the dominant aggregation cost)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# A1/A9/O1 — flagship: TPC-H Q1-style pricing summary (scan→filter→agg→sort)
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)             AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                                                                       AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
                                                                       AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)  AS avg_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
                                                                       AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + grouped aggregation; the entry() flagship.

    r15 perf: the three dsum decimal(28,6) sums moved to exact
    bigint-scaled sums (``_util.bsum`` — integral qty, cents price, 4-dp
    disc_price; contracts fixture-verified), lockstep oracle, loud
    envelope guard. Values bit-equal to the decimal path at every
    driver SF (sums < 2^53). 1.16 -> ~0.5 s warm."""
    li = spark.table("lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    a = (
        li.where(F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            bsum("l_quantity").alias("_sq"),
            bsum("l_extendedprice", 2).alias("_sp"),
            bsum(disc, 4).alias("_sdp"),
            F.count("*").alias("count_order"),
            bmax("l_quantity").alias("_mq"),
            bmax("l_extendedprice", 2).alias("_mp"),
            bmax(disc, 4).alias("_mdp"),
        )
    )
    n = F.col("count_order")
    sum_qty = bval(F.col("_sq"), n, F.col("_mq"), 0, "q01")
    sum_bp = bval(F.col("_sp"), n, F.col("_mp"), 2, "q01")
    sum_dp = bval(F.col("_sdp"), n, F.col("_mdp"), 4, "q01")
    return a.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty.alias("sum_qty"),
        sum_bp.alias("sum_base_price"),
        sum_dp.alias("sum_disc_price"),
        (sum_qty / n).alias("avg_qty"),
        (sum_bp / n).alias("avg_price"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# J1/J2 — multi-way star join with broadcast dims (revenue per nation)
# ---------------------------------------------------------------------------
@query(
    "q02_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact joins shuffle on keys; dimension joins broadcast.

    100 TB note: nation/region/customer are broadcastable dims; lineitem ⋈
    orders is the only genuine shuffle. AQE converts it to shuffled-hash /
    handles skew at runtime.
    """
    li, o = spark.table("lineitem"), spark.table("orders")
    c, n, r = spark.table("customer"), spark.table("nation"), spark.table("region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            bsum(_rev(), 4).alias("_sr"),
            F.count("*").alias("n_lines"),
            bmax(_rev(), 4).alias("_mr"),
        )
        .select(
            "n_name",
            bval(F.col("_sr"), F.col("n_lines"), F.col("_mr"), 4, "q02")
            .alias("revenue"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# J4 — left outer join (customers incl. those with zero orders)
# ---------------------------------------------------------------------------
@query(
    "q03_customer_order_stats",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0) AS DOUBLE)
               AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q03_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers."""
    c, o = spark.table("customer"), spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# J6 — left semi join (EXISTS)
# ---------------------------------------------------------------------------
@query(
    "q04_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 finished order — no duplication, no payload from
    the right side (semi join keeps the build side narrow at scale)."""
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# J7 — left anti join (NOT EXISTS)
# ---------------------------------------------------------------------------
@query(
    "q05_anti_join",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = spark.table("customer"), spark.table("orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# J5 — cross join (small × small)
# ---------------------------------------------------------------------------
@query(
    "q06_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def q06_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("region")
        .crossJoin(spark.table("nation"))
        .select("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# J8 — non-equi (theta) join: parts priced within a supplier-specific band
# ---------------------------------------------------------------------------
@query(
    "q07_theta_join",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_parts
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal / 4 AND s_acctbal / 2
    GROUP BY s_suppkey
    """,
)
def q07_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality condition → BroadcastNestedLoopJoin (small side
    broadcast). At 100 TB one side must be broadcastable or the condition
    bucketized (SURVEY §2.3 J9 note)."""
    s, p = spark.table("supplier"), spark.table("part")
    cond = (p.p_retailprice >= s.s_acctbal / 4) & (p.p_retailprice <= s.s_acctbal / 2)
    return s.join(p, cond).groupBy("s_suppkey").agg(F.count("*").alias("n_parts"))


# ---------------------------------------------------------------------------
# O1/O2 — global top-k (ORDER BY + LIMIT → TakeOrderedAndProject)
# ---------------------------------------------------------------------------
@query(
    "q08_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q08_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst plans TakeOrderedAndProject: per-partition heap + driver
    merge — no global sort, the only top-k shape that survives 100 TB."""
    return (
        spark.table("orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U1-U4 — set operations
# ---------------------------------------------------------------------------
@query(
    "q09_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def q09_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "q10_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q10_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "q11_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F' AND l_returnflag = 'A'
    """,
)
def q11_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    b = li.where(
        (F.col("l_linestatus") == "F") & (F.col("l_returnflag") == "A")
    ).select("l_orderkey")
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# A2 — multi-distinct aggregation
# ---------------------------------------------------------------------------
@query(
    "q12_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q12_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct → Catalyst RewriteDistinctAggregates (expand + two-
    phase agg), still shuffle-bounded."""
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# A8 — ROLLUP grouping sets
# ---------------------------------------------------------------------------
@query(
    "q13_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            bsum("l_quantity").alias("_sq"),
            F.count("*").alias("n"),
            bmax("l_quantity").alias("_mq"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            bval(F.col("_sq"), F.col("n"), F.col("_mq"), 0, "q13")
            .alias("sum_qty"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# A9/A10 — HAVING + per-aggregate FILTER
# ---------------------------------------------------------------------------
@query(
    "q14_having_filtered_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def q14_having_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
                "n_urgent"
            ),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(28,6)"),
                )
            )
            .cast("double")
            .alias("f_spend"),
        )
        .where(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# A7 — min_by / max_by / bool_or
# ---------------------------------------------------------------------------
@query(
    "q15_minmax_by",
    oracle="""
    SELECT o_custkey,
           MIN_BY(o_orderkey, o_totalprice) AS cheapest_order,
           MAX_BY(o_orderkey, o_totalprice) AS priciest_order,
           BOOL_OR(o_orderstatus = 'F') AS any_finished
    FROM orders GROUP BY o_custkey
    """,
)
def q15_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TD_FIRST/TD_LAST analogue (SURVEY §2.4 A7). o_totalprice is unique
    per customer in the fixture, making min_by/max_by deterministic."""
    o = spark.table("orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


# ---------------------------------------------------------------------------
# P3 — predicate surface: BETWEEN / IN / LIKE / IS NULL / boolean algebra
# ---------------------------------------------------------------------------
@query(
    "q16_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_name LIKE '%re%'
      AND p_retailprice IS NOT NULL
    """,
)
def q16_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part")
    return p.where(
        F.col("p_size").between(10, 30)
        & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_name").like("%re%")
        & F.col("p_retailprice").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size")


# ---------------------------------------------------------------------------
# J1-J3 depth — TPC-H Q5-shape: 6-table join with a co-location predicate
# (customer and supplier must share a nation). Harder than q02's star: the
# c_nationkey = s_nationkey condition correlates two dimension paths, so
# the optimizer must keep both nationkeys alive until the late equality.
# 100 TB plan: lineitem ⋈ orders is the single genuine shuffle; supplier/
# customer/nation/region broadcast; the co-location predicate evaluates
# inside the broadcast joins — no extra exchange. (TPC-H Q5 semantics,
# public spec.)
# ---------------------------------------------------------------------------
@query(
    "q105_local_supplier_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
               AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q105_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders fulfilled by a supplier in the customer's own
    nation (TPC-H Q5 analogue), per nation in ASIA, 1995-1996."""
    li, o = spark.table("lineitem"), spark.table("orders")
    c, s = spark.table("customer"), spark.table("supplier")
    n, r = spark.table("nation"), spark.table("region")
    o = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            bsum(_rev(), 4).alias("_sr"),
            F.count("*").alias("n_lines"),
            bmax(_rev(), 4).alias("_mr"),
        )
        .select(
            "n_name",
            bval(F.col("_sr"), F.col("n_lines"), F.col("_mr"), 4, "q105")
            .alias("revenue"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated (TPC-H Q17 shape). The user
# writes "lineitems below 20% of that part's average quantity"; the
# engine's plan is the decorrelation Catalyst itself would pick: compute
# the per-part aggregate once, join it back, filter. The oracle keeps the
# LITERAL correlated subquery so the test pins semantics, not plan shape.
# ---------------------------------------------------------------------------
@query(
    "q47_correlated_subquery",
    oracle="""
    SELECT l.l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_small_lots,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS small_lot_revenue
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    """,
)
def q47_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-lot orders per part (TPC-H Q17 pattern): per-part average
    joined back on the grouping key — one partial-agg shuffle plus a
    co-partitioned join, no per-row subquery execution."""
    li = spark.table("lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < F.col("threshold"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small_lots"),
            bsum("l_extendedprice", 2).alias("_sp"),
            bmax("l_extendedprice", 2).alias("_mp"),
        )
        .select(
            "l_partkey",
            "n_small_lots",
            bval(F.col("_sp"), F.col("n_small_lots"), F.col("_mp"), 2, "q47")
            .alias("small_lot_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg parity). Spark has no
# ordered collect: sort structs inside the aggregate (array_sort on the
# collected list), which keeps the ordering guarantee inside the
# aggregation — immune to shuffle reordering — instead of relying on a
# pre-sort the optimizer may drop.
# ---------------------------------------------------------------------------
@query(
    "q48_listagg",
    oracle="""
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q48_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-joined, alphabetically ordered nation list per region —
    the LISTAGG surface with an in-aggregate ordering guarantee."""
    n = spark.table("nation")
    r = spark.table("region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations_csv"),
        )
    )


# ---------------------------------------------------------------------------
# Revenue concentration — top-10-customer share per nation: aggregate →
# window rank over the AGGREGATED grain (customer rollup, tiny next to
# the fact table) → second aggregate. The fact table is touched once.
# ---------------------------------------------------------------------------
@query(
    "q49_revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_nationkey, r,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY r DESC, o_custkey) AS rn
      FROM rev
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS total_revenue,
           ROUND(CAST(SUM(CASE WHEN rn <= 10 THEN r ELSE 0 END) / SUM(r)
                      AS DOUBLE), 6) AS top10_share
    FROM ranked JOIN nation n ON ranked.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q49_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is each nation's order revenue in its top-10
    customers — rank runs on the customer rollup, never the fact rows."""
    o = spark.table("orders")
    c = spark.table("customer")
    nat = spark.table("nation")
    from pyspark.sql import Window as W

    rev = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("r")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("r").desc(), F.col("o_custkey")
    )
    ranked = rev.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("r").cast("double").alias("total_revenue"),
            F.round(
                (
                    F.sum(F.when(F.col("rn") <= 10, F.col("r")).otherwise(0))
                    / F.sum("r")
                ).cast("double"),
                6,
            ).alias("top10_share"),
        )
    )


# ---------------------------------------------------------------------------
# NULL-semantics parity — null-safe equality, COALESCE/NULLIF chains,
# null-aware counts, and NULL ordering inside aggregation keys. These
# are where engines silently disagree; the oracle pins Spark's <=> to
# IS NOT DISTINCT FROM, and NULL grouping keys to their own group.
# ---------------------------------------------------------------------------
@query(
    "q59_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'O') AS maybe_status,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS maybe_prio
      FROM orders
    )
    SELECT maybe_status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(maybe_prio) AS BIGINT) AS n_prio_nonnull,
           CAST(SUM(CASE WHEN maybe_prio IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_null,
           COALESCE(MIN(maybe_prio), 'none') AS min_prio
    FROM t GROUP BY maybe_status
    """,
)
def q59_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF-derived keys grouped WITH a NULL group, null-aware COUNT,
    null-safe equality (<=>), and COALESCE defaults — the null-handling
    contract, pinned cross-engine."""
    o = spark.table("orders")
    t = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("maybe_prio"),
    )
    return t.groupBy("maybe_status").agg(
        F.count("*").alias("n_rows"),
        F.count("maybe_prio").alias("n_prio_nonnull"),
        F.sum(
            F.col("maybe_prio").eqNullSafe(F.lit(None)).cast("bigint")
        ).alias("n_null_safe_null"),
        F.coalesce(F.min("maybe_prio"), F.lit("none")).alias("min_prio"),
    )


# ---------------------------------------------------------------------------
# Year-over-year growth — yearly revenue per nation, YoY % via lag at
# YEAR grain (the q145 MoM pattern one level up; rollup once, window
# over ~n_nations × 7 rows).
# ---------------------------------------------------------------------------
@query(
    "q153_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT c.c_nationkey, year(o.o_orderdate) AS yr,
             SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS rev,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT n.n_name AS nation, CAST(y.yr AS INT) AS yr,
           CAST(y.rev AS DOUBLE) AS revenue,
           CAST(y.n_orders AS BIGINT) AS n_orders,
           ROUND(CAST((y.rev - lag(y.rev) OVER w) / lag(y.rev) OVER w
                      AS DOUBLE), 6) AS yoy_pct
    FROM yearly y JOIN nation n ON y.c_nationkey = n.n_nationkey
    WINDOW w AS (PARTITION BY y.c_nationkey ORDER BY y.yr)
    """,
)
def q153_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue and YoY growth per nation — aggregate once,
    window at year grain."""
    from pyspark.sql import Window as W

    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    yearly = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
            F.count("*").alias("n_orders"),
        )
    )
    w = W.partitionBy("c_nationkey").orderBy("yr")
    prev = F.lag("rev").over(w)
    return (
        yearly.join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("yr").cast("int").alias("yr"),
            F.col("rev").cast("double").alias("revenue"),
            "n_orders",
            F.round(((F.col("rev") - prev) / prev).cast("double"), 6)
            .alias("yoy_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Order lifecycle — the order-grain denormalization: line counts, value
# totals, ship-window span, and order→first-ship latency. One lineitem
# rollup co-keyed with orders; the join is 1:1 after aggregation.
# ---------------------------------------------------------------------------
@query(
    "q154_order_lifecycle",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
               AS line_value,
             MIN(l_shipdate) AS first_ship,
             MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           l.n_lines,
           l.line_value,
           CAST(date_diff('day', o.o_orderdate, l.first_ship) AS BIGINT)
             AS days_to_first_ship,
           CAST(date_diff('day', l.first_ship, l.last_ship) AS BIGINT)
             AS ship_span_days
    FROM orders o JOIN lines l ON o.o_orderkey = l.l_orderkey
    """,
)
def q154_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order fulfillment profile: lineitem rollup then a 1:1 join
    back to orders — the canonical fact-to-entity denormalization."""
    li = spark.table("lineitem")
    o = spark.table("orders")
    lines = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("line_value"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    return (
        o.join(lines, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "n_lines",
            "line_value",
            F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("days_to_first_ship"),
            F.datediff(F.to_date("last_ship"), F.to_date("first_ship"))
            .cast("bigint")
            .alias("ship_span_days"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonality index — day-of-week revenue share vs uniform expectation:
# the rollup-vs-global-window composition at 7-row grain.
# ---------------------------------------------------------------------------
@query(
    "q155_seasonality_index",
    oracle="""
    WITH dow AS (
      SELECT dayofweek(o_orderdate) + 1 AS dow,
             SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(CAST(rev AS DOUBLE) * 7.0
                 / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS seasonality
    FROM dow
    """,
)
def q155_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week revenue concentration (1.0 = uniform) — global
    window runs over exactly 7 rollup rows."""
    from pyspark.sql import Window as W

    o = spark.table("orders")
    dow = o.groupBy(F.dayofweek("o_orderdate").alias("dow")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
        F.count("*").alias("n_orders"),
    )
    return dow.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        F.round(
            F.col("rev").cast("double")
            * 7.0
            / F.sum("rev").over(W.partitionBy()).cast("double"),
            6,
        ).alias("seasonality"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — recency/frequency/monetary quintiles per customer,
# composed into a segment label. All three ntile windows run at
# customer grain (post-rollup); the fixed as-of instant keeps recency
# deterministic.
# ---------------------------------------------------------------------------
_RFM_ASOF = "2002-01-01"


@query(
    "q156_rfm_segments",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       TIMESTAMP '{_RFM_ASOF} 00:00:00') AS recency_d,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, recency_d, frequency,
             CAST(monetary AS DOUBLE) AS monetary,
             ntile(5) OVER (ORDER BY recency_d ASC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score * 100 + f_score * 10 + m_score AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           -- decimal-sum / count, never engine AVG: double AVG is
           -- addition-order-dependent and diverged in the last ulp at
           -- sf0.1, flipping the 6dp round (monetary is exactly a 6dp
           -- decimal, so the re-cast is lossless)
           ROUND(CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_monetary,
           ROUND(AVG(CAST(recency_d AS DOUBLE)), 6) AS avg_recency_d
    FROM scored GROUP BY 1
    """,
)
def q156_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM quintile segments (r*100+f*10+m) with per-segment
    size and value — three global ntiles at customer grain."""
    o = spark.table("orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_ASOF).cast("date"), F.to_date(F.max("o_orderdate"))
        ).alias("recency_d"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("mon"),
    )
    # three DISTRIBUTED exact quintiles (customer grain is fact-sized at
    # warehouse scale): chained two-phase ranks, one bucketed shuffle each,
    # never a one-partition ntile window
    from pandas_td_spark.operators.ranking import (
        SMALL_THRESHOLD,
        with_global_ntile,
    )

    # aggregate-grain opt-in (customer grain): one shared count feeds all
    # three gates; at/below SMALL_THRESHOLD each ntile is a single sorted
    # partition, above it the same calls auto-switch to the distributed
    # two-phase rank — the library default never counts implicitly.
    n_cust = cust.count()  # one job; shared by all three gates below
    scored = with_global_ntile(
        with_global_ntile(
            with_global_ntile(
                cust,
                [F.col("recency_d").asc(), F.col("o_custkey")],
                5,
                out="r_score",
                small_threshold=SMALL_THRESHOLD,
                input_rows=n_cust,
            ),
            [F.col("frequency").desc(), F.col("o_custkey")],
            5,
            out="f_score",
            small_threshold=SMALL_THRESHOLD,
            input_rows=n_cust,
        ),
        [F.col("mon").desc(), F.col("o_custkey")],
        5,
        out="m_score",
        small_threshold=SMALL_THRESHOLD,
        input_rows=n_cust,
    ).select(
        "recency_d",
        F.col("mon").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )
    return (
        scored.groupBy(
            (
                F.col("r_score") * 100
                + F.col("f_score") * 10
                + F.col("m_score")
            )
            .cast("bigint")  # Spark ntile is int32; DuckDB's is BIGINT
            .alias("segment")
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("monetary").cast("decimal(28,6)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("avg_monetary"),
            F.round(F.avg(F.col("recency_d").cast("double")), 6).alias(
                "avg_recency_d"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — split each purchase's value EQUALLY across
# the user's clicks in the preceding 7 days (linear attribution). The
# candidate join is day-bucketed (probe 8 buckets), never a BNLJ; the
# per-purchase click count comes from one window at candidate grain.
# ---------------------------------------------------------------------------
@query(
    "q157_linear_attribution",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ), cand AS (
      SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             p.value AS pval,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n_touch
      FROM ev p JOIN ev c
        ON p.user_id = c.user_id
        AND c.t <= p.t AND c.t > p.t - 604800
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    )
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases_touched,
           ROUND(SUM(pval / n_touch), 6) AS attributed_value
    FROM cand GROUP BY click_id
    """,
)
def q157_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) attribution of purchase value to preceding
    clicks within 7 days — day-bucketed candidate join + one window at
    candidate grain."""
    from pyspark.sql import Window as W

    ev = spark.table("events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").cast("bigint").alias("t"),
    )
    day = 86400
    window_s = 604800
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("value").alias("pval"),
        F.col("t").alias("p_t"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("t").alias("c_t"),
        (F.col("t") / day).cast("bigint").alias("b"),
    )
    # probe the purchase's day bucket and the 7 preceding
    probe = purchases.withColumn(
        "b",
        F.explode(
            F.sequence(
                (F.col("p_t") / day).cast("bigint") - 7,
                (F.col("p_t") / day).cast("bigint"),
            )
        ),
    )
    cand = probe.join(clicks, ["u", "b"]).where(
        (F.col("c_t") <= F.col("p_t"))
        & (F.col("c_t") > F.col("p_t") - window_s)
    )
    n_touch = F.count("*").over(W.partitionBy("purchase_id"))
    return (
        cand.select(
            "click_id", "purchase_id", "pval", n_touch.alias("n_touch")
        )
        .groupBy("click_id")
        .agg(
            F.count("*").alias("n_purchases_touched"),
            F.round(F.sum(F.col("pval") / F.col("n_touch")), 6).alias(
                "attributed_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket lift — association metrics over co-ordered part pairs:
# support / confidence / lift from the q121 edge pipeline plus two
# marginal rollups (broadcast back). The pair space is bounded by the
# co-order join, never |parts|².
# ---------------------------------------------------------------------------
@query(
    "q158_basket_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT o) AS n FROM li),
    item AS (SELECT p, COUNT(*) AS n_p FROM li GROUP BY p),
    pair AS (
      SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_ab
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    )
    SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_both,
           ROUND(CAST(n_ab AS DOUBLE) / n_orders.n, 6) AS support,
           ROUND(CAST(n_ab AS DOUBLE) / ia.n_p, 6) AS confidence,
           ROUND(CAST(n_ab AS DOUBLE) * n_orders.n
                 / (CAST(ia.n_p AS DOUBLE) * ib.n_p), 6) AS lift
    FROM pair
    JOIN item ia ON pair.pa = ia.p
    JOIN item ib ON pair.pb = ib.p
    CROSS JOIN n_orders
    WHERE n_ab >= 3
    """,
)
def q158_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-ordered parts (min co-count 3):
    support, confidence, lift — pair counts from the co-order join,
    marginals broadcast back."""
    from pandas_td_spark.queries.advanced import distinct_order_parts

    # shared memoized (o, p) checkpoint (graph family base): three uses
    # below would otherwise each re-run the lineitem scan + distinct
    li = distinct_order_parts(spark)
    # order total rides as a lazy broadcast scalar (exact int -> double)
    nof = li.agg(F.count_distinct("o").cast("double").alias("__no"))
    item = li.groupBy("p").agg(F.count("*").alias("n_p"))
    pair = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    ia = item.select(F.col("p").alias("pa"), F.col("n_p").alias("n_pa"))
    ib = item.select(F.col("p").alias("pb"), F.col("n_p").alias("n_pb"))
    return (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(nof))
        .select(
            "pa",
            "pb",
            F.col("n_ab").alias("n_both"),
            F.round(
                F.col("n_ab").cast("double") / F.col("__no"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_pa"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("__no")
                / (F.col("n_pa").cast("double") * F.col("n_pb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority: top unshipped orders by revenue
# for one segment. Filter both sides before the join, aggregate at
# order grain, TakeOrdered for the top 10.
# ---------------------------------------------------------------------------
@query(
    "q160_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_epoch
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q160_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: revenue of unshipped BUILDING-segment orders — both
    fact filters applied pre-join, top-10 via TakeOrderedAndProject."""
    from pandas_td_spark.queries._util import dsum

    c = spark.table("customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.table("orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = spark.table("lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate")
            .cast("bigint")
            .alias("orderdate_epoch"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order-priority checking: orders with at least one
# late line (EXISTS → left-semi join), counted per priority.
# ---------------------------------------------------------------------------
@query(
    "q161_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def q161_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: priorities of H1-1996 orders having a line shipped
    after the order date — EXISTS compiled to a left-semi join with the
    non-equi predicate as a join condition."""
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = spark.table("lineitem")
    matched = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item report: customers ranked by revenue
# lost to returns in a quarter.
# ---------------------------------------------------------------------------
@query(
    "q162_returned_items",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q162_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by returned revenue in 1997Q1 — return
    flag pushed to the lineitem scan, nation broadcast, top-20 via
    TakeOrdered."""
    from pandas_td_spark.queries._util import dsum

    c = spark.table("customer")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = spark.table("lineitem").where(F.col("l_returnflag") == "R")
    n = spark.table("nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("lost_revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promotion effect: share of revenue from one part
# type family in a month; conditional aggregation over one join.
# ---------------------------------------------------------------------------
@query(
    "q163_promo_share",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(28,6))
                    ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q163_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-type revenue share for one ship month —
    month filter on the scan, part dim broadcast, conditional decimal
    sums."""
    l = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = spark.table("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = l.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.agg(
        F.round(
            100.0
            * F.sum(
                F.when(
                    F.col("p_type").like("PROMO%"),
                    rev.cast("decimal(28,6)"),
                ).otherwise(F.lit(0).cast("decimal(28,6)"))
            ).cast("double")
            / F.sum(rev.cast("decimal(28,6)")).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# UNION BY NAME with missing columns — schema-evolution-tolerant
# concatenation (Spark allowMissingColumns=True ≡ DuckDB
# UNION ALL BY NAME): absent columns become NULL, order-insensitive.
# ---------------------------------------------------------------------------
@query(
    "q169_union_by_name",
    oracle="""
    SELECT c_custkey AS k, c_mktsegment AS segment, NULL AS balance
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL BY NAME
    SELECT c_acctbal AS balance, c_custkey AS k, NULL AS segment
    FROM customer WHERE c_acctbal > 9000
    """,
)
def q169_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-name-aligned union across differently-shaped inputs — the
    schema-evolution append path (missing columns null-filled)."""
    c = spark.table("customer")
    a = c.where(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
    )
    b = c.where(F.col("c_acctbal") > 9000).select(
        F.col("c_acctbal").alias("balance"),
        F.col("c_custkey").alias("k"),
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping: revenue flowing between a nation
# pair in both directions, by ship year. Two independent dim chains
# (supplier-side, customer-side nation) hang off the same fact scan;
# both are broadcast, so the only shuffle is the final rollup.
# ---------------------------------------------------------------------------
@query(
    "q170_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q170_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.
    supplier/nation and customer/nation chains broadcast onto one
    lineitem scan; the disjunctive pair predicate lands post-join where
    both nation names are in scope."""
    l = spark.table("lineitem")
    s = spark.table("supplier")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            bsum(_rev(), 4).alias("_sr"),
            F.count("*").alias("n_lines"),
            bmax(_rev(), 4).alias("_mr"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            bval(F.col("_sr"), F.col("n_lines"), F.col("_mr"), 4, "q170")
            .alias("revenue"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: fraction of one region's
# import revenue supplied by one nation, per order year. The share is
# a ratio of two conditional decimal sums over the same joined scan.
# ---------------------------------------------------------------------------
@query(
    "q171_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS mkt_share,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'REGION_0'
    GROUP BY EXTRACT(year FROM o.o_orderdate)
    """,
)
def q171_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of REGION_0 customers' import revenue
    by order year — numerator as a conditional decimal sum, denominator
    the unconditional sum, one pass."""
    l = spark.table("lineitem")
    s = spark.table("supplier")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "REGION_0")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", rev
                    ).otherwise(F.lit(0).cast("decimal(28,6)"))
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit: revenue from one part family
# attributed to the supplier's nation, by ship year. (The fixture has
# no partsupp, so profit is the discounted revenue rather than
# revenue minus supplycost — same join/agg topology.)
# ---------------------------------------------------------------------------
@query(
    "q172_parttype_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS amount,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q172_parttype_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no-partsupp adaptation): widget-family revenue by
    supplier nation x ship year. The selective part filter is applied
    before its broadcast join so only matching partkeys replicate."""
    l = spark.table("lineitem")
    p = spark.table("part").where(F.col("p_name").like("%widget%"))
    s = spark.table("supplier")
    n = spark.table("nation")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            bsum(_rev(), 4).alias("_sr"),
            F.count("*").alias("n_lines"),
            bmax(_rev(), 4).alias("_mr"),
        )
        .select(
            "nation",
            "ship_year",
            bval(F.col("_sr"), F.col("n_lines"), F.col("_mr"), 4, "q172")
            .alias("amount"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution: LEFT OUTER join
# so zero-order customers survive into the histogram, then a second
# aggregation at the count grain.
# ---------------------------------------------------------------------------
@query(
    "q173_custorder_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q173_custorder_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: per-customer non-urgent order counts (left outer join
    keeps zero-order customers, COUNT(col) skips the null side), then
    the distribution of those counts. Second rollup is at count grain —
    tiny shuffle."""
    c = spark.table("customer")
    o = spark.table("orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s): revenue per supplier for one ship
# quarter, keep every supplier tying the maximum. The max is attached
# via a broadcast of the 1-row global aggregate, not a sort.
# ---------------------------------------------------------------------------
@query(
    "q174_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_name, r.suppkey, r.total_revenue
    FROM rev r JOIN supplier s ON r.suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q174_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in 1997Q1. The scalar
    max comes from a cross-joined 1-row aggregate (broadcast), so no
    global sort and ties are kept. Decimal sums make the equality
    engine-exact."""
    l = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = spark.table("supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_name", "suppkey", "total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders: orders whose total quantity
# exceeds a threshold (HAVING on the order rollup), joined back to
# customer detail.
# ---------------------------------------------------------------------------
@query(
    "q175_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_epoch,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(t.sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    ) t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q175_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders with > 250 total quantity. The HAVING rollup
    runs first and is highly selective (~1% of orders), so IT is the
    broadcast side of both enrichment joins — the big tables are never
    shuffled. l_quantity is integral-valued, so its plain double SUM is
    exact (no decimal detour needed)."""
    l = spark.table("lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    o = spark.table("orders")
    c = spark.table("customer")
    return (
        o.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate")
            .cast("bigint")
            .alias("orderdate_epoch"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive brand/size/quantity predicates: an
# OR-of-ANDs spanning both join sides. Catalyst extracts the common
# p_partkey equi-key; the residual disjunction evaluates post-join.
# ---------------------------------------------------------------------------
@query(
    "q176_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q176_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR of brand/size/quantity clause
    triples. The part side is pre-filtered to the union of brands
    (derivable single-side implication of the disjunction) before the
    broadcast, shrinking the build side ~10x."""
    l = spark.table("lineitem")
    p = spark.table("part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    joined = l.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    clause = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        joined.where(clause)
        .agg(
            bsum(_rev(), 4).alias("_sr"),
            F.count("*").alias("n_lines"),
            bmax(_rev(), 4).alias("_mr"),
        )
        .select(
            bval(F.col("_sr"), F.col("n_lines"), F.col("_mr"), 4, "q176")
            .alias("revenue"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — dormant high-balance customers: above-average
# balance AND no recent orders. Scalar subquery broadcast + left-anti
# join against the recent-order keys.
# ---------------------------------------------------------------------------
@query(
    "q177_dormant_customers",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def q177_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (phone-prefix replaced by nationkey): customers above
    the positive-balance average with no orders since 2000, rolled up
    per nation. The average is a broadcast 1-row aggregate; NOT EXISTS
    compiles to a left-anti join on the pre-filtered recent orders. The
    threshold average is computed as exact decimal-sum / count in BOTH
    engines so the > comparison can never flip on a last-ulp AVG
    difference."""
    c = spark.table("customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = spark.table("orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — sole returning supplier: in orders served by >= 2
# suppliers, suppliers who returned lines while no co-supplier did.
# Exists AND not-exists over the same fact, both as join-reductions on
# a shared deduplicated (order, supplier) edge list.
# ---------------------------------------------------------------------------
@query(
    "q178_sole_returner",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), returned AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R'
    ), multi AS (
      SELECT l_orderkey FROM edges GROUP BY l_orderkey
      HAVING COUNT(*) >= 2
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM returned r
    JOIN multi m ON r.l_orderkey = m.l_orderkey
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE NOT EXISTS (
      SELECT 1 FROM returned r2
      WHERE r2.l_orderkey = r.l_orderkey
        AND r2.l_suppkey <> r.l_suppkey
    )
    GROUP BY s.s_name
    """,
)
def q178_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (returnflag standing in for receipt>commit lateness):
    per supplier, count of multi-supplier orders where they were the
    ONLY supplier with a returned line. The inequality-correlated NOT
    EXISTS becomes: orders with exactly one distinct returning supplier
    (a count at order grain) — turning the anti self-join into one
    aggregate, the decorrelation a 100x fact table needs.

    r14 fusion (the interleaved comparator's first stable-letter find,
    6.9x same-window): the old plan ran TWO distincts over lineitem
    (all pairs + returned pairs) — two scans, two pair-grain exchanges,
    then an order-grain semi-join. Both distincts collapse into ONE
    pair-grain aggregate carrying ``max(returnflag='R')``, and the
    multi/sole tests become one order-grain aggregate over it (n_supp,
    n_ret = sum of the pair flags, ret_supp = the flagged supplier) —
    one scan, one pair exchange with map-side combine, one order
    exchange, no semi-join. 2.80 -> 0.98 s warm at sf0.1 (values
    verified identical against the oracle); at 100 TB it halves the
    shuffled bytes on the fact's widest grain."""
    l = spark.table("lineitem")
    pairs = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("ret").alias("n_ret"),
        F.max(F.when(F.col("ret") == 1, F.col("l_suppkey"))).alias(
            "ret_supp"
        ),
    )
    s = spark.table("supplier")
    return (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
        .join(F.broadcast(s), F.col("ret_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — cheapest qualifying supplier: for each size-10
# part, the supplier(s) with MIN acctbal among those who ever shipped
# it. (lineitem stands in for partsupp as the part-supplier edge.)
# Correlated MIN decorrelated into a grouped aggregate joined back.
# ---------------------------------------------------------------------------
@query(
    "q179_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_acctbal, s.s_name
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size = 10
    )
    SELECT ps.l_partkey AS partkey, ps.s_name,
           CAST(ps.s_acctbal AS DOUBLE) AS acctbal
    FROM ps
    WHERE ps.s_acctbal = (
      SELECT MIN(ps2.s_acctbal) FROM ps ps2
      WHERE ps2.l_partkey = ps.l_partkey
    )
    """,
)
def q179_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (lineitem as the part-supplier edge): per size-10 part,
    supplier(s) with minimum account balance. The correlated scalar MIN
    is decorrelated to one per-part aggregate joined back on (part,
    acctbal) — ties kept, matching the subquery semantics. All dims
    broadcast; the distinct edge list is the only shuffle."""
    l = spark.table("lineitem")
    p = spark.table("part").where(F.col("p_size") == 10)
    s = spark.table("supplier")
    ps = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "l_suppkey", "s_acctbal", "s_name")
        .distinct()
    )
    mins = ps.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        ps.join(
            F.broadcast(mins),
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-salted join (J25) — the hot-key mitigation, certified for
# CORRECTNESS: the fact side's join key is salted pmod(xxhash, 8) and
# the dim side replicated 8x, so one hot key spreads over 8 reducers;
# the oracle is the UNSALTED plain join, proving the rewrite is
# result-identical. At 100 TB this is what q140's skew profile tells
# you to reach for; AQE skew-join does it adaptively, salting does it
# deterministically.
# ---------------------------------------------------------------------------
@query(
    "q218_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q218_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted orders-customer join aggregated per market segment —
    bit-identical to the plain join the oracle runs."""
    n_salt = 8
    o = spark.table("orders").withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt))
    )
    salts = spark.range(n_salt).select(F.col("id").alias("__salt"))
    c = (
        spark.table("customer")
        .select("c_custkey", "c_mktsegment")
        .crossJoin(F.broadcast(salts))
    )
    j = o.join(
        c,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (o["__salt"] == c["__salt"]),
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).cast("bigint").alias("rev_cents"),
    )


# ---------------------------------------------------------------------------
# U-shaped (position-based) attribution (J26) — 40% to the first touch,
# 40% to the last, the middle 20% split over interior clicks; n=1 gets
# all, n=2 splits 50/50. Same day-bucketed candidate join as q157's
# linear model; position comes from one rank window at candidate grain.
# Weights are ratios of identical integers (identical doubles both
# engines); per-click totals are 12dp-rounded decimal sums so partition
# order can't perturb them.
# ---------------------------------------------------------------------------
@query(
    "q224_ushape_attribution",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ), cand AS (
      SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             p.value AS pval,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.t, c.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n_touch
      FROM ev p JOIN ev c
        ON p.user_id = c.user_id
        AND c.t <= p.t AND c.t > p.t - 604800
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    ), weighted AS (
      SELECT click_id, pval,
             CASE WHEN n_touch = 1 THEN 1.0
                  WHEN n_touch = 2 THEN 0.5
                  WHEN pos = 1 OR pos = n_touch THEN 0.4
                  ELSE 0.2 / (n_touch - 2) END AS w
      FROM cand
    )
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases_touched,
           CAST(SUM(CAST(round(pval * w, 12) AS DECIMAL(28,12)))
                AS DOUBLE) AS attributed_value
    FROM weighted GROUP BY click_id
    """,
)
def q224_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based 40/20/40 attribution of purchase value over the
    preceding 7 days of clicks."""
    from pyspark.sql import Window as W

    ev = spark.table("events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").cast("bigint").alias("t"),
    )
    day, window_s = 86400, 604800
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("value").alias("pval"),
        F.col("t").alias("p_t"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("t").alias("c_t"),
        (F.col("t") / day).cast("bigint").alias("b"),
    )
    probe = purchases.withColumn(
        "b",
        F.explode(
            F.sequence(
                (F.col("p_t") / day).cast("bigint") - 7,
                (F.col("p_t") / day).cast("bigint"),
            )
        ),
    )
    cand = probe.join(clicks, ["u", "b"]).where(
        (F.col("c_t") <= F.col("p_t"))
        & (F.col("c_t") > F.col("p_t") - window_s)
    )
    wp = W.partitionBy("purchase_id")
    cand = cand.select(
        "click_id",
        "pval",
        F.row_number().over(wp.orderBy("c_t", "click_id")).alias("pos"),
        F.count("*").over(wp).alias("n_touch"),
    )
    w = (
        F.when(F.col("n_touch") == 1, 1.0)
        .when(F.col("n_touch") == 2, 0.5)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_touch")), 0.4
        )
        .otherwise(F.lit(0.2) / (F.col("n_touch") - 2))
    )
    return (
        cand.select("click_id", (F.col("pval") * w).alias("term"))
        .groupBy("click_id")
        .agg(
            F.count("*").alias("n_purchases_touched"),
            F.sum(
                F.round(F.col("term"), 12).cast("decimal(28,12)")
            ).cast("double").alias("attributed_value"),
        )
    )
