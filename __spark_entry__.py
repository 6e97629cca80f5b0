"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pandas_td_spark.queries.registry`` — every implemented
operator from SURVEY.md §2 registers there with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Make a DRIVER-PROVIDED session usable: the driver builds its own
    SparkSession without our factory, so the two confs the fixtures/
    semantics depend on must be set at runtime (both are runtime-settable
    SQL confs — verified):

    * nanosAsLong — events.parquet stores TIMESTAMP(NANOS), unreadable by
      Spark 4.x otherwise (sources/io.py normalizes the long back to µs);
    * UTC session tz — td_time_format renders via date_format, which
      applies the session timezone after our explicit UTC shift.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from pandas_td_spark.functions.presto_compat import register_presto_functions
    from pandas_td_spark.functions.td import register_td_functions

    register_td_functions(spark)
    register_presto_functions(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    _prepare(spark)
    from pandas_td_spark.queries.registry import spark_queries

    return spark_queries()["q01_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pandas_td_spark.queries.registry import spark_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in spark_queries().items():

        def with_funcs(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _prepare(spark)
            return _fn(spark, sf_dir)

        out[name] = with_funcs
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names)."""
    from pandas_td_spark.queries.registry import oracle_sqls

    return oracle_sqls()
