"""ANALYZE-style per-column statistics (engine metadata surface; SURVEY
§2 S6-adjacent — the optimizer-statistics table every warehouse
publishes from `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`).

Shape: one column-pruned aggregate PER COLUMN, unioned — at 100 TB the
columnar scans cost roughly one full-width scan in total, every
aggregate partial/merges map-side, and the result is |columns| rows.
The exact `n_distinct` keeps the result oracle-certifiable; the scale
twin is `approx_count_distinct` (swap documented per call site), which
turns each NDV into a mergeable HLL of KB-scale state.

``min_val``/``max_val`` aggregate over the NATIVE column type (string
min would order '10' before '9') and only the RESULT is rendered to a
string through caller-supplied SQL templates, so one frame can carry
every column type; the templates use ``{c}`` for the aggregate
expression and ``{T}`` for the engine's string type keyword (Spark
``STRING`` / DuckDB ``VARCHAR``), letting a single spec drive both the
Spark plan and a DuckDB oracle identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_stats", "column_stats_sql"]

#: default render: plain cast to the engine's string type
DEFAULT_RENDER = "CAST({c} AS {T})"


def column_stats(
    df: DataFrame, specs: list[tuple[str, str]], string_type: str = "STRING"
) -> DataFrame:
    """``(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)``
    per (column, render) spec — exact NDV, one pruned scan per column."""
    parts = []
    for col, render in specs:
        tpl = render or DEFAULT_RENDER
        rmin = tpl.format(c=f"MIN({col})", T=string_type)
        rmax = tpl.format(c=f"MAX({col})", T=string_type)
        parts.append(
            df.agg(
                F.lit(col).alias("column_name"),
                F.count("*").alias("n_rows"),
                (F.count("*") - F.count(col)).cast("bigint").alias("n_nulls"),
                F.countDistinct(col).cast("bigint").alias("n_distinct"),
                F.expr(f"CAST({rmin} AS {string_type})").alias("min_val"),
                F.expr(f"CAST({rmax} AS {string_type})").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def column_stats_sql(
    table: str, specs: list[tuple[str, str]], string_type: str = "VARCHAR"
) -> str:
    """The DuckDB/ANSI twin of :func:`column_stats` over ``table`` —
    generated from the SAME specs so renders cannot drift."""
    selects = []
    for col, render in specs:
        tpl = render or DEFAULT_RENDER
        rmin = tpl.format(c=f"MIN({col})", T=string_type)
        rmax = tpl.format(c=f"MAX({col})", T=string_type)
        selects.append(
            f"SELECT '{col}' AS column_name, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls, "
            f"CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct, "
            f"CAST({rmin} AS {string_type}) AS min_val, "
            f"CAST({rmax} AS {string_type}) AS max_val "
            f"FROM {table}"
        )
    return " UNION ALL ".join(selects)
