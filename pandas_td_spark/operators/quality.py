"""Declarative data-quality checks (Deequ/Great-Expectations pattern,
public: Schelter et al., VLDB 2018 "Automating Large-Scale Data Quality
Verification") as a single-pass DataFrame computation.

Each rule is a boolean expression evaluated per row; ALL rules reduce in
ONE aggregate over ONE scan (conditional sums), so adding a rule costs an
expression, not a pass. Referential-integrity rules need their own
(anti-join) pass by nature — they compose via union of the same
long-format result schema:

    (rule, n_rows, n_violations, pass_frac)

100 TB posture: row-rule verification is scan-bound and embarrassingly
parallel; RI checks are left-anti hash joins (broadcast when the parent
side is a dim). Nothing collects; the result is rule-cardinality rows.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_rules", "check_unique", "check_referential"]


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named boolean rules in one aggregate pass.

    ``rules`` maps rule name → Column that is TRUE when the row PASSES.
    NULL rule results count as violations (unknown ≠ pass).
    """
    aggs = [F.count("*").alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    stack = ", ".join(f"'{n}', __v_{n}" for n in rules)
    return one.select(
        F.expr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        # try_divide: NULL pass_frac on a zero-row input (empty time
        # partitions are normal) instead of an ANSI divide-by-zero
        F.round(
            1.0 - F.try_divide("n_violations", "n_rows"), 6
        ).alias("pass_frac"),
    )


def check_unique(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """Uniqueness rule: violations = rows beyond the first per key."""
    dup = df.groupBy(*cols).agg(F.count("*").alias("__c"))
    return dup.agg(
        F.lit(rule).alias("rule"),
        F.sum("__c").alias("n_rows"),
        F.sum(F.col("__c") - 1).alias("n_violations"),
        F.round(
            1.0 - F.try_divide(F.sum(F.col("__c") - 1), F.sum("__c")), 6
        ).alias("pass_frac"),
    )


def check_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity: child keys with no parent (left-anti)."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    orphans = child.join(p, child_key, "left_anti")
    n = child.count()
    return orphans.agg(
        F.lit(rule).alias("rule"),
        F.lit(n).alias("n_rows"),
        F.count("*").alias("n_violations"),
        F.round(
            1.0 - F.try_divide(F.count("*"), F.lit(float(n))), 6
        ).alias("pass_frac"),
    )
