"""Incremental aggregate maintenance (materialized-view refresh).

No reference locus (pandas-td delegated rollups to TD's hosted engines —
/root/reference is empty); semantics follow the standard algebraic-
aggregate decomposition every incremental-view-maintenance system uses
(partial states that merge associatively: COUNT/SUM merge by SUM,
MIN/MAX by MIN/MAX; AVG derives as merged-SUM / merged-COUNT).

The 100 TB point: refreshing a keyed rollup after a new partition lands
must cost O(delta + state), never O(history). Both inputs here are
already AGGREGATED partial states (one row per key), so the merge is a
union + one hash re-aggregation at key grain — shuffle volume is the
state size, and the historical fact table is never rescanned. This is
the batch twin of Structured Streaming's update-mode aggregation state.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_agg_states", "MERGE_COMBINERS"]

#: How a partial-aggregate column of each kind merges across states.
#: ``count`` states merge by SUM (counts are sums of ones), which is why
#: it aliases the same combiner.
MERGE_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    spec: dict[str, str],
) -> DataFrame:
    """Merge per-key partial-aggregate states (identical schemas:
    ``keys`` + the columns named in ``spec``) into one state frame.

    ``spec`` maps each state column to its aggregate kind
    (``sum``/``count``/``min``/``max``). Keys present in only some
    states merge correctly because the union simply contributes fewer
    rows for them. Derived aggregates (avg, stddev) are NOT state
    columns — carry their algebraic moments (sum, count, sum of
    squares) and derive after the merge."""
    unknown = {k for k in spec.values() if k not in MERGE_COMBINERS}
    if unknown:
        raise ValueError(f"unknown aggregate kinds: {sorted(unknown)}")
    cols = [*keys, *spec]
    df = reduce(
        lambda a, b: a.unionByName(b), [s.select(*cols) for s in states]
    )
    return df.groupBy(*keys).agg(
        *[MERGE_COMBINERS[kind](c).alias(c) for c, kind in spec.items()]
    )
