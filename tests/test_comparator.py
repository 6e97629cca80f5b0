"""Driver-faithfulness of the LOCAL comparator (SURVEY.md §5).

The driver hashes TYPED values, so an int column on one side vs a float
column on the other is a driver-red even when every value compares equal
under Python ``==`` (0 == 0.0). Two driver-reds slipped through a green
local suite exactly this way (q41 round 2, q103 round 4: DuckDB window
``SUM(BIGINT)`` is HUGEINT, and uncast arithmetic on it canonicalizes to
pandas float64). These tests pin the comparator's strictness so the class
is caught by pytest, not by the next round's CORRECTNESS artifact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL

from pandas_td_spark.testing.oracle import compare_frames, run_oracle


def test_uncast_window_sum_oracle_fails_locally():
    """End-to-end instance of the q103 bug class: a DuckDB window-sum
    minus a column, left UNCAST, comes back float64 and must flag
    against the engine's int64 even though the values are equal."""
    oracle = run_oracle(
        SF_SMALL,
        """
        WITH run AS (
          SELECT doc_id,
                 SUM(n_chars) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                 CAST(n_chars AS BIGINT) AS n_chars
          FROM documents
        )
        SELECT doc_id, cum - n_chars AS start_offset FROM run
        """,
    )
    assert str(oracle["start_offset"].dtype).startswith("float"), (
        "precondition: DuckDB HUGEINT arithmetic canonicalizes to float64"
    )
    engine_side = pd.DataFrame(
        {
            "doc_id": oracle["doc_id"],
            "start_offset": oracle["start_offset"].astype("int64"),
        }
    )
    problems = compare_frames(engine_side, oracle)
    assert any(p.startswith("dtype col 'start_offset'") for p in problems), (
        f"strict comparator must flag int-vs-float: {problems}"
    )


def test_matching_int_widths_pass():
    a = pd.DataFrame({"k": np.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"k": np.array([1, 2], dtype="int64")})
    # width differences stay legal (both 'int' class); the driver hash
    # risk for widths is removed at the source by the bigint-cast
    # discipline (windows.py:45), not by the comparator
    assert compare_frames(a, b) == []


def test_null_widened_float64_both_sides_stays_legal():
    a = pd.DataFrame({"v": [1.0, np.nan]})
    b = pd.DataFrame({"v": [1.0, np.nan]})
    assert compare_frames(a, b) == []


def test_int_vs_float_flags_even_when_values_equal():
    a = pd.DataFrame({"v": np.array([0, 1], dtype="int64")})
    b = pd.DataFrame({"v": np.array([0.0, 1.0], dtype="float64")})
    problems = compare_frames(a, b)
    assert problems and "dtype col 'v'" in problems[0]


def _perturb(value):
    """A type-appropriate single-cell mutation (never a no-op)."""
    from decimal import Decimal

    if isinstance(value, bool):
        return not value
    if isinstance(value, Decimal):
        return value + Decimal(1)
    if isinstance(value, (int, float)) and not pd.isna(value):
        return value + 1
    if isinstance(value, str):
        return value + "·"
    return 0  # None / NaN / exotic → a concrete wrong value


def test_perturbation_control_every_column_goes_red(spark):
    """NEGATIVE CONTROL for the load-bearing instrument (VERDICT r10
    #7): run a real query green against its oracle, then flip exactly
    one cell per column and assert the gate goes red EVERY time — a
    silent comparator regression (dropped column, lenient equality,
    accidental float coercion) can never green a wrong answer again.
    Also controls the rowcount and multiset dimensions (dropped row;
    duplicated row at equal rowcount)."""
    from pandas_td_spark.queries.registry import all_queries, spark_queries

    name = "q01_pricing_summary"
    q = all_queries()[name]
    sdf = spark_queries()[name](spark, SF_SMALL).toPandas()
    oracle = run_oracle(SF_SMALL, q.oracle)
    assert compare_frames(sdf, oracle) == [], "precondition: green"
    assert len(sdf) >= 2 and len(sdf.columns) >= 3, "fixture too small"
    for col in sdf.columns:
        mutated = sdf.copy()
        i = int(mutated[col].first_valid_index() or 0)
        mutated.at[i, col] = _perturb(mutated.at[i, col])
        assert compare_frames(mutated, oracle), (
            f"single-cell flip in {col!r} must go red"
        )
    # dropped row → rowcount red
    assert compare_frames(
        sdf.drop(index=[sdf.index[0]]).reset_index(drop=True), oracle
    ), "dropped row must go red"
    # duplicated row replacing another (rowcount unchanged) → value red
    dup = sdf.copy()
    dup.iloc[0] = dup.iloc[1]
    assert compare_frames(dup, oracle), "row duplication must go red"
    # renamed column → schema red
    ren = sdf.rename(columns={sdf.columns[-1]: "__wrong_name"})
    assert compare_frames(ren, oracle), "renamed column must go red"
