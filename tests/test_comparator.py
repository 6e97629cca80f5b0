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
