"""Python UDF surface (SURVEY.md §2.11): scalar pandas_udf, grouped-map
``applyInPandas``, grouped-agg pandas_udf, and a Python UDTF.

The reference client defined no UDFs (users relied on server-side
Presto/Hive functions); this module supplies the engine-native extension
points. Rules of engagement (ARCHITECTURE.md design rule 2): these exist
for logic that genuinely needs Python (numpy/scipy, model inference) —
anything expressible as built-in expressions stays JVM-side. All paths are
Arrow-batched; nothing is row-at-a-time pickled.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

__all__ = [
    "zscore_per_group",
    "mad_outliers_per_group",
    "grouped_geometric_mean",
    "register_udtfs",
]


def zscore_per_group(
    df: DataFrame, key: str, value: str, out: str = "zscore"
) -> DataFrame:
    """Grouped-map ``applyInPandas`` (SNIPPETS.md [2] pattern): per-key
    z-score of ``value``. One shuffle on the key; each group is a pandas
    DataFrame in a python worker, Arrow both ways.

    (A window expression could compute this JVM-side — this function is the
    canonical grouped-map example, and the template for per-group logic
    that has no expression equivalent.)
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType: StructType.add mutates the df's own schema object
    schema = StructType(
        list(df.schema.fields) + [StructField(out, DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value].std(ddof=1)
        z = (pdf[value] - pdf[value].mean()) / std if std and std > 0 else 0.0
        return pdf.assign(**{out: z})

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _z, schema=schema
    )


def mad_outliers_per_group(
    df: DataFrame, key: str, value: str, n_mads: float = 3.0
) -> DataFrame:
    """Per-key robust outliers (median absolute deviation) — a genuinely
    non-expression computation (two dependent medians per group)."""
    out_schema = f"{key} long, n_outliers long, mad double"

    def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value].median()
        mad = (pdf[value] - med).abs().median()
        thresh = n_mads * 1.4826 * mad
        n_out = int(((pdf[value] - med).abs() > thresh).sum()) if mad > 0 else 0
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n_outliers": [n_out], "mad": [mad]}
        )

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _mad, schema=out_schema
    )


# NOTE: the return type must be a DataType INSTANCE, not the DDL string
# "double" — pyspark parses string schemas through the active
# SparkContext, so a string here makes importing this module require a
# live session (observed r11: fingerprint coverage silently varied with
# session state because the import failed in bare processes).
@pandas_udf(DoubleType())
def _geomean(v: pd.Series) -> float:  # grouped-agg pandas UDF (UDAF)
    import numpy as np

    x = v.dropna()
    return float(np.exp(np.log(x[x > 0]).mean())) if len(x) else float("nan")


def grouped_geometric_mean(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-agg pandas_udf (the UDAF surface): geometric mean per key —
    participates in hash aggregation like a native aggregate."""
    return df.groupBy(key).agg(_geomean(F.col(value)).alias("geomean"))


def register_udtfs(spark) -> None:
    """Python UDTF (Spark 3.5+ ``@udtf``): ``split_ngrams(text, n)`` emits
    one row per word n-gram — the table-function counterpart of
    LATERAL VIEW explode, usable directly in SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string, pos: int")
    class SplitNgrams:
        def eval(self, text: str, n: int):  # noqa: D401
            if not text:
                return
            words = text.split(" ")
            for i in range(max(len(words) - n + 1, 0)):
                yield (" ".join(words[i : i + n]), i)

    spark.udtf.register("split_ngrams", SplitNgrams)


def _spread_groups(df: DataFrame, key: str) -> DataFrame:
    """Explicit key-hash repartition to core count before a sequential
    per-key walk. AQE coalesces shuffle partitions by BYTE size, but a
    Python walk's cost is per ROW: at sf0.1 the ~5 MB events shuffle
    coalesced to ONE partition and the walk ran single-core (measured
    3.3 s at 1x vs 0.93 s at 10x data, tools/scale_experiment.py). An
    explicit repartition is exempt from AQE coalescing and satisfies the
    groupBy's clustering requirement, so no second shuffle is added; on
    a real cluster defaultParallelism tracks total cores — the right
    width for a CPU-bound stage at any data size."""
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, key
    )


def capped_running_balance(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    delta: str,
    lo: float,
    hi: float,
    out: str = "balance",
) -> DataFrame:
    """Per-key running balance clamped to [lo, hi] AFTER EVERY STEP —
    inventory/credit/quota semantics. The clamp makes the recurrence
    non-associative, so no window/aggregate can express it: this is the
    canonical applyInPandas use case (genuinely sequential per-key
    logic). Each group walks once in insertion order; the batch cost is
    one shuffle + a linear pass per key. For unbounded per-key streams
    the same recurrence runs under transformWithState
    (streaming/jobs.py::make_running_totals_processor is the template).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out, DoubleType())]
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        # iterate the raw ndarray: Series.__iter__ pays index machinery
        # per element — ~3x slower on the million-row sf0.1 walks
        bal, acc = [], 0.0
        for d in pdf[delta].to_numpy():
            acc = min(max(acc + float(d), lo), hi)
            bal.append(acc)
        return pdf.assign(**{out: bal})

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _walk, schema=schema
    )


def ewma(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    x: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average
    ``y_i = alpha*x_i + (1-alpha)*y_{i-1}`` (y_0 = x_0) — the smoothing
    recurrence whose closed form is numerically explosive, so like
    :func:`capped_running_balance` it runs as a genuinely sequential
    per-key walk under applyInPandas. One shuffle, a linear pass per
    key; same recurrence slots into transformWithState for streams.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out, DoubleType())]
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        vals, acc = [], None
        for v in pdf[x].to_numpy():
            v = float(v)
            acc = v if acc is None else alpha * v + (1.0 - alpha) * acc
            vals.append(acc)
        return pdf.assign(**{out: vals})

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _walk, schema=schema
    )


def cusum(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    x: str,
    target: str,
    out: str = "cusum",
) -> DataFrame:
    """Per-key one-sided upper CUSUM ``s_i = max(0, s_{i-1} + (x_i -
    target))`` (s_0 = 0 before the first observation) — the classic
    change-point/drift detector. Like :func:`ewma` the recurrence is
    non-associative, so it runs as a sequential per-key walk under
    applyInPandas: one shuffle on ``key``, then a linear pass. With
    integer inputs (cents-grain metrics) every state is an exact
    integer, so the result is engine-reproducible bit-for-bit.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out, LongType())]
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        vals, acc = [], 0
        for v, t in zip(pdf[x].to_numpy(), pdf[target].to_numpy()):
            acc = max(0, acc + int(v) - int(t))
            vals.append(acc)
        return pdf.assign(**{out: vals})

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _walk, schema=schema
    )


def debounce(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    epoch: str,
    min_gap: int,
    out: str = "kept",
) -> DataFrame:
    """Per-key time debounce: keep an event iff it is at least
    ``min_gap`` seconds after the last KEPT event (first is kept). The
    state depends on which earlier events survived — not expressible as
    a window over the raw sequence — so like :func:`cusum` it is a
    sequential per-key walk (one shuffle, parallel across keys).
    Integer epochs keep it engine-exact.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out, IntegerType())]
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        kept, last = [], None
        for e in pdf[epoch].to_numpy():
            e = int(e)
            if last is None or e - last >= min_gap:
                kept.append(1)
                last = e
            else:
                kept.append(0)
        return pdf.assign(**{out: kept})

    return _spread_groups(df, key).groupBy(key).applyInPandas(
        _walk, schema=schema
    )
