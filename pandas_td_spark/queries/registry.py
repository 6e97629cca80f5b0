"""Named-query registry backing ``__spark_entry__.queries()/oracle_sql()``.

Every implemented operator from SURVEY.md §2 registers here as
``(name, spark_fn, duckdb_oracle_sql)``. ``oracle=None`` marks operators
that are not faithfully expressible in DuckDB SQL (approx sketches, LSH) —
the driver then records a weaker rows-only check.

Naming contract (FIXTURES.md): every computed column is aliased identically
in the Spark plan and the oracle SQL; the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a named query. The wrapped function receives
    ``(spark, sf_dir)`` with all fixture views already registered."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect modules that populate the registry.
    from pandas_td_spark.queries import (  # noqa: F401
        advanced,
        approx,
        coverage,
        llm,
        relational,
        tdfuncs,
        text,
        windows,
    )


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    out: dict[str, QueryFn] = {}
    for name, q in _REGISTRY.items():
        # bind views for the requested sf_dir before running the body
        def wrapped(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            from pandas_td_spark.sources.io import register_views

            register_views(spark, sf_dir)
            return _q.fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sqls() -> dict[str, str]:
    _ensure_loaded()
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}
