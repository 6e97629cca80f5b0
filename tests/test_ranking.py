"""Distributed exact global ranking (operators/ranking.py) must equal
the single-partition window forms bit-for-bit, while keeping the data
spread across partitions (the whole point)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pandas_td_spark.operators.ranking import (
    with_global_ntile,
    with_global_row_number,
)


def _fixture(spark, n=100_000):
    # heavy ties on k (1000 distinct), unique tiebreak id, scrambled order
    return (
        spark.range(n, numPartitions=16)
        .select(
            F.col("id").alias("i"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k"),
        )
        .repartition(16)  # scramble: input order must not matter
    )


def test_global_row_number_matches_window(spark):
    df = _fixture(spark)
    got = with_global_row_number(df, ["k", "i"], out="rn", small_threshold=0)
    want = df.withColumn(
        "rn", F.row_number().over(W.orderBy("k", "i")).cast("bigint")
    )
    assert (
        got.select("i", "rn")
        .exceptAll(want.select("i", "rn"))
        .count()
        == 0
    )
    # and the result is NOT a single partition
    assert got.rdd.getNumPartitions() > 1


def test_global_ntile_matches_window(spark):
    df = _fixture(spark)
    for k in (10, 7):  # 7 does not divide 100000: remainder path
        got = with_global_ntile(df, ["k", "i"], k, out="b", small_threshold=0)
        want = df.withColumn(
            "b", F.ntile(k).over(W.orderBy("k", "i")).cast("bigint")
        )
        assert (
            got.select("i", "b").exceptAll(want.select("i", "b")).count()
            == 0
        ), f"ntile({k}) mismatch"


def test_global_ntile_fewer_rows_than_buckets(spark):
    df = spark.range(3).select(F.col("id").alias("i"))
    got = {
        r["i"]: r["b"]
        for r in with_global_ntile(df, ["i"], 10, out="b").collect()
    }
    assert got == {0: 1, 1: 2, 2: 3}


def test_gated_window_path_matches_distributed(spark):
    df = _fixture(spark, n=5_000)
    a = with_global_row_number(df, ["k", "i"], out="rn")  # gated: window
    b = with_global_row_number(df, ["k", "i"], out="rn", small_threshold=0)
    assert (
        a.select("i", "rn").exceptAll(b.select("i", "rn")).count() == 0
    )
