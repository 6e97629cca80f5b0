"""Physical-plan inspection helpers (SURVEY.md §4, §5 item 1).

The reference had no plan layer (SQL text shipped to Presto); in this
engine the *plan shape* is a first-class correctness property at scale:
filters must reach the parquet scan, small dims must broadcast, top-k must
not global-sort. These helpers turn ``explain`` output into assertable
facts; tests/test_plans.py keeps the flagship plans honest, so a future
"optimization" that silently un-pushes a filter fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "codegen_stage_count",
]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for row-group skipping."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each scan (column pruning check)."""
    plan = physical_plan(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        scans.append(cols)
    return scans


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans — wider is better (fewer
    interpreter boundaries)."""
    return len(set(re.findall(r"codegen id : (\d+)", physical_plan(df))))
