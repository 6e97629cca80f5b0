"""Gap-based sessionization (reference: TD's ``td_sessionize`` UDF,
SURVEY.md §2.8 F8 — deprecated upstream, delegated server-side; no client
locus, /root/reference empty).

Batch implementation: the classic cumulative-gap idiom —

    new_sess = (ts - lag(ts) > timeout) OR first-row
    session_id = running sum of new_sess per key

Cost model at 100 TB: exactly one shuffle (hash by ``key``) shared by both
window functions (same partition spec), sort within partitions, streaming
aggregation — no per-key state beyond the sort buffer. Skewed keys (one
user with billions of events) are the risk; mitigate upstream by bucketing
the table on the session key.

Streaming twin: ``F.session_window`` with a watermark
(streaming/jobs.py) — same session semantics, bounded state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["with_session_id"]


def with_session_id(
    df: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    timeout_sec: int,
    order_cols: Sequence[str] = (),
    out_col: str = "session_id",
) -> DataFrame:
    """Append a 0-based ``session_id`` per key, split at gaps > timeout.

    ``ts_col`` may be TIMESTAMP (compared at second granularity, TD
    semantics) or epoch-seconds BIGINT. ``order_cols`` break timestamp ties
    deterministically.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col, *order_cols]
    w = W.partitionBy(*keys).orderBy(*order)
    t: Column = F.col(ts_col)
    from pandas_td_spark.functions.td import is_timestamp_dtype

    if is_timestamp_dtype(dict(df.dtypes).get(ts_col)):
        t = F.unix_timestamp(t)
    prev = F.lag(t).over(w)
    new_sess = F.when(
        prev.isNull() | ((t - prev) > F.lit(timeout_sec)), F.lit(1)
    ).otherwise(F.lit(0))
    running = F.sum(new_sess).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(out_col, (running - F.lit(1)).cast("bigint"))
