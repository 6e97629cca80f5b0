"""The primary correctness gate, mirrored locally (SURVEY.md §5 item 2):
every registered query runs on Spark AND DuckDB at sf0.001 and must match
exactly (row count + schema + order-insensitive values).

sf0.001 keeps the suite fast; the driver runs the same comparison at sf0.01.
Run `SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle.py`
for the driver-scale check.
"""

from __future__ import annotations

import os

import pytest

from pandas_td_spark.queries.registry import all_queries
from pandas_td_spark.testing.oracle import check_query

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, SF_DIR, name)
    assert not problems, f"{name}: " + "; ".join(problems)
