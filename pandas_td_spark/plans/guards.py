"""Runtime scale guards.

A handful of window/sort shapes are correct on any input but collapse to a
single task at scale (global = unpartitioned windows sort the ENTIRE input
into one partition — no cluster size helps). Round 1 flagged those in
docstrings only; docstrings don't fire in production, so these guards turn
the prose into a runtime signal. Cost: a driver-side Catalyst statistics
lookup (no job, no scan).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

__all__ = ["warn_if_global_window_input_large", "estimated_size_bytes"]

#: Above this optimizer size estimate, a single-partition sort is assumed
#: to be a mistake rather than a dim-table convenience (256 MiB ≈ one fat
#: executor task; tune per deployment).
DEFAULT_GLOBAL_WINDOW_MAX_BYTES = 256 * 1024 * 1024


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (driver-side plan statistics —
    file sizes for scans, propagated through operators; no job is run)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def warn_if_global_window_input_large(
    df: DataFrame,
    what: str = "unpartitioned window",
    max_bytes: int = DEFAULT_GLOBAL_WINDOW_MAX_BYTES,
) -> DataFrame:
    """Emit a RuntimeWarning when ``df`` — about to feed a global window /
    single-partition sort — is estimated to exceed ``max_bytes``.

    Returns ``df`` unchanged so it drops into a plan fluently:

        supplier = warn_if_global_window_input_large(supplier)
        supplier.select(F.ntile(4).over(Window.orderBy(...)), ...)
    """
    est = estimated_size_bytes(df)
    if est > max_bytes:
        warnings.warn(
            f"{what} over an input estimated at {est / 1e6:.0f} MB "
            f"(> {max_bytes / 1e6:.0f} MB): the whole input sorts into ONE "
            "task regardless of cluster size. Partition the window by a "
            "key (Window.partitionBy), or pre-aggregate before ranking.",
            RuntimeWarning,
            stacklevel=2,
        )
    return df
