"""Structured Streaming tests (SURVEY.md §5 item 4): replay events.parquet
through a file source with Trigger.AvailableNow and check streaming results
against their batch twins; exercise watermark dedup and the idempotent sink.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from pandas_td_spark.streaming.jobs import (
    dedup_stream,
    events_stream,
    run_to_memory,
    sessionized_counts,
    tumbling_counts,
    write_idempotent_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(spark):
    """Stage events as µs-timestamp parquet split into several files (the
    fixture's TIMESTAMP(NANOS) isn't readable by the streaming reader)."""
    from pandas_td_spark.sources.io import register_views

    register_views(spark, SF)
    d = tempfile.mkdtemp(prefix="events_stream_")
    spark.table("events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _name() -> str:
    return "t" + uuid.uuid4().hex[:8]


def test_tumbling_counts_match_batch(spark, staged):
    stream = events_stream(spark, staged, max_files_per_trigger=1)
    got = run_to_memory(tumbling_counts(stream), _name(), spark).toPandas()
    batch = spark.read.parquet(staged)
    want = (
        batch.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
        .toPandas()
    )
    key = ["win_start", "win_end", "event_type"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert got.equals(want[got.columns])


def test_session_windows_match_batch(spark, staged):
    # staged files are round-robin (each spans the whole month), so later
    # micro-batches deliver events behind the watermark; a watermark wider
    # than the fixture's 30-day span keeps every session alive so the
    # drained result is comparable to the batch twin. (With the default 1h
    # watermark, eviction of finalized sessions was observed — correct
    # semantics, but not what this equivalence test measures.)
    stream = events_stream(spark, staged, max_files_per_trigger=1)
    got = run_to_memory(
        sessionized_counts(stream, watermark="60 days"), _name(), spark
    ).toPandas()
    batch = spark.read.parquet(staged)
    want = (
        batch.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    key = ["user_id", "session_start"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert got.equals(want[got.columns])


def test_streaming_dedup_drops_replayed_files(spark, staged):
    """Same events delivered twice (two file copies) → exactly-once out."""
    d = tempfile.mkdtemp(prefix="events_dup_")
    batch = spark.read.parquet(staged)
    batch.write.mode("append").parquet(d)
    batch.write.mode("append").parquet(d)  # duplicate delivery
    stream = events_stream(spark, d, max_files_per_trigger=2)
    got = run_to_memory(
        dedup_stream(stream), _name(), spark, output_mode="append"
    )
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_idempotent_sink_overwrites_batch_partition(spark, staged):
    out = tempfile.mkdtemp(prefix="sink_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    stream = events_stream(spark, staged)
    q = write_idempotent_parquet(stream, out, ckpt).start()
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 == spark.read.parquet(staged).count()
    # replay from a fresh checkpoint (simulates redelivery of every batch):
    # dynamic partition overwrite must keep the row count stable, not double
    ckpt2 = tempfile.mkdtemp(prefix="ckpt2_")
    q2 = write_idempotent_parquet(events_stream(spark, staged), out, ckpt2).start()
    q2.awaitTermination()
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_stateful_running_totals(spark, staged):
    """T7: applyInPandasWithState accumulates across micro-batches; the
    last update per user equals the batch-mode totals."""
    from pandas_td_spark.streaming.jobs import running_user_totals

    stream = events_stream(spark, staged, max_files_per_trigger=1)
    name = _name()
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    want = (
        spark.read.parquet(staged)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert got.equals(want)


def test_stream_stream_interval_join_matches_batch(spark, staged):
    """Stream-stream join (watermarked, bounded state) produces the same
    matches as the identical batch join."""
    from pandas_td_spark.streaming.jobs import purchases_with_recent_clicks

    def split(df):
        return (
            df.where(F.col("event_type") == "purchase"),
            df.where(F.col("event_type") == "click"),
        )

    sp, sc = split(events_stream(spark, staged))
    name = _name()
    q = (
        purchases_with_recent_clicks(sp, sc, watermark="60 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name).toPandas()
    bp, bc = split(spark.read.parquet(staged))
    want = purchases_with_recent_clicks(bp, bc).toPandas()
    key = ["p_id", "c_ts"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)[got.columns]
    assert len(got) > 0 and got.equals(want)
