"""Fixed-work calibration probes (VERDICT r13 #3).

This box has documented multi-hour ambient speed swings (SURVEY r13: the
same frozen tree measured 155.3 s -> 219.6 s -> 164.7/177.2 s across four
battery runs; a single-thread probe swung 0.8 -> 1.9 s). Raw round-over-
round battery totals therefore confound code changes with machine load.
Every benchmark artifact now stamps the medians of three deterministic,
fixed-work probes so future rounds can load-normalize:

* ``py_single`` — a pure-Python single-thread arithmetic loop (~0.4 s
  nominal). Tracks per-core scalar throughput / CPU contention.
* ``np_mt``     — a pinned 1536^2 float64 numpy matmul (BLAS,
  multi-threaded). Tracks many-core FP throughput.
* ``spark_32``  — a fixed 64M-row range -> pmod -> groupBy count on the
  session (32-way shuffle). Tracks end-to-end Spark/JVM health including
  codegen + shuffle service, i.e. the thing the battery actually exercises.

Probes are median-of-3 like every other number in the artifact. Callers
run the set at the start AND end of a battery (and optionally midway) so
within-run drift is visible, not just cross-run drift.
"""

from __future__ import annotations

import statistics
import time


def _median3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 4)


def _py_single() -> None:
    acc = 0
    for i in range(3_000_000):
        acc += i * i ^ (i >> 3)
    # keep the loop observable so CPython can't dead-code it
    if acc == -1:  # pragma: no cover
        raise AssertionError


def _np_mt() -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((1536, 1536))
    (a @ a).sum()


def probes(spark=None) -> dict[str, float]:
    """Run the probe set; include ``spark_32`` only when a live session
    is passed (the DuckDB-only caller has no JVM to probe)."""
    out = {
        "py_single": _median3(_py_single),
        "np_mt": _median3(_np_mt),
    }
    if spark is not None:
        def _spark_job() -> None:
            from pyspark.sql import functions as F

            (
                spark.range(64_000_000, numPartitions=32)
                .withColumn("k", F.pmod("id", F.lit(1024)))
                .groupBy("k")
                .count()
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        out["spark_32"] = _median3(_spark_job)
    return out
