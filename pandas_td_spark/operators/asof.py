"""As-of join (SURVEY.md §2.3 J10).

The reference ecosystem had no server-side as-of primitive — pandas users
downloaded results and ran ``pandas.merge_asof`` client-side (SURVEY §2.3).
Here it is a native distributed operator via the union+window trick:

    union(left tagged 1, right tagged 0)
    last(right_value IGNORE NULLS) over (partition by key
                                         order by ts, tag
                                         rows unbounded preceding..current)
    keep left rows

One shuffle (hash by key) + one sort — same cost class as a window
function, no nested-loop scan, no per-key driver work; this is the shape
that survives 100 TB (vs merge_asof's single-machine sort-merge).

Equal-timestamp semantics match ``merge_asof(direction='backward',
allow_exact_matches=True)``: the right row sorts before the left row at
identical ts (tag 0 < 1), so exact matches are visible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | Sequence[str],
    left_on: str,
    right_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """For every left row, attach the most recent right row (per ``by``
    key) with right.ts <= left.ts. Left rows with no prior right row keep
    NULLs (left-join semantics).

    ``value_cols`` defaults to every right column except keys/timestamp;
    attached columns are renamed ``<name><suffix>``. The right timestamp is
    always attached as ``<right_on><suffix>``.

    ``tie_breakers``: right-side columns appended to the window ORDER BY.
    When several right rows share (key, timestamp), ``last(ignorenulls)``
    would otherwise pick an arbitrary one of the tied rows (partitioning-
    dependent — pandas ``merge_asof`` resolves ties by input order, which
    a shuffled DataFrame does not have). Pass a unique sequence/id column
    to make the attached value deterministic: the tied row with the
    HIGHEST tie-breaker value wins.
    """
    keys = [by] if isinstance(by, str) else list(by)
    right_on = right_on or left_on
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*keys, right_on)
        ]
    # tie-breakers not already attached still need to ride along in the
    # union (NULL on the left side) so the window can order by them
    extra_tb = [
        c for c in tie_breakers if c not in value_cols and c != right_on
    ]
    carried = (right_on, *value_cols, *extra_tb)
    l_tag, r_tag = F.lit(1), F.lit(0)
    lefts = left.select(
        *left.columns,
        l_tag.alias("__tag"),
        F.col(left_on).alias("__ts"),
        *[F.lit(None).alias(f"__r_{c}") for c in carried],
    )
    rights = right.select(
        *[F.col(k) for k in keys],
        r_tag.alias("__tag"),
        F.col(right_on).alias("__ts"),
        F.col(right_on).alias(f"__r_{right_on}"),
        *[F.col(c).alias(f"__r_{c}") for c in (*value_cols, *extra_tb)],
    )
    unioned = lefts.unionByName(rights, allowMissingColumns=True)
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__tag", *[f"__r_{c}" for c in tie_breakers])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in (right_on, *value_cols)
        ],
    )
    drop = ["__tag", "__ts"] + [f"__r_{c}" for c in carried]
    return filled.where(F.col("__tag") == 1).drop(*drop)
