"""tdpack Python DataSource (sources/packstream.py): chunked binary
record transport — distributed writer (one chunk per task, job-commit
protocol) + distributed reader (one split per chunk)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pandas_td_spark.sources.packstream import register_tdpack

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from pandas_td_spark.sources.io import register_views

    register_views(spark, SF)
    register_tdpack(spark)


def test_round_trip_all_types_with_nulls(spark):
    src = spark.table("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        (F.col("o_orderkey") % 2 == 0).alias("flag"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_orderpriority"))
        .alias("maybe_null"),
    )
    d = tempfile.mkdtemp(prefix="tdpack_rt_")
    src.write.format("tdpack").option("path", d).mode("overwrite").save()
    back = spark.read.format("tdpack").option("path", d).load()
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in src.schema.fields
    ]
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_writer_chunks_follow_partitions_and_reader_splits_follow_chunks(
    spark,
):
    src = spark.table("customer").select("c_custkey", "c_name")
    d = tempfile.mkdtemp(prefix="tdpack_par_")
    src.repartition(4).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    chunks = [f for f in os.listdir(d) if f.endswith(".tdpack")]
    assert len(chunks) == 4
    back = spark.read.format("tdpack").option("path", d).load()
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()


def test_overwrite_replaces_previous_chunks(spark):
    d = tempfile.mkdtemp(prefix="tdpack_ow_")
    a = spark.range(100).select(F.col("id").alias("x"))
    a.repartition(3).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    b = spark.range(7).select(F.col("id").alias("x"))
    b.repartition(1).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    back = spark.read.format("tdpack").option("path", d).load()
    assert back.count() == 7
    assert len([f for f in os.listdir(d) if f.endswith(".tdpack")]) == 1


def test_append_merges_chunk_lists_across_jobs(spark):
    d = tempfile.mkdtemp(prefix="tdpack_app_")
    a = spark.range(100).select(F.col("id").alias("x"))
    a.repartition(3).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    b = spark.range(100, 107).select(F.col("id").alias("x"))
    b.repartition(2).write.format("tdpack").option("path", d).mode(
        "append"
    ).save()
    back = spark.read.format("tdpack").option("path", d).load()
    assert back.count() == 107
    assert back.agg(F.sum("x")).first()[0] == sum(range(107))


def test_append_header_rows_match_surviving_chunks(spark):
    """ADVICE r8: an append must not carry forward the row counts of
    previously committed chunks whose files have since vanished — the
    header's total has to equal what a reader can actually see."""
    import json

    d = tempfile.mkdtemp(prefix="tdpack_rows_")
    a = spark.range(90).select(F.col("id").alias("x"))
    a.repartition(3).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    with open(os.path.join(d, "_tdpack_schema.json")) as f:
        hdr = json.load(f)
    assert hdr["rows"] == 90
    assert sum(hdr["chunk_rows"].values()) == 90
    # one committed chunk vanishes out-of-band (manual cleanup, lost disk)
    victim = sorted(hdr["chunks"])[0]
    lost = hdr["chunk_rows"][victim]
    assert lost > 0
    os.remove(os.path.join(d, victim))
    b = spark.range(100, 107).select(F.col("id").alias("x"))
    b.repartition(1).write.format("tdpack").option("path", d).mode(
        "append"
    ).save()
    with open(os.path.join(d, "_tdpack_schema.json")) as f:
        hdr2 = json.load(f)
    back = spark.read.format("tdpack").option("path", d).load()
    n = back.count()
    assert n == 90 - lost + 7
    assert hdr2["rows"] == n  # header never overstates the readable rows
    assert sum(hdr2["chunk_rows"].values()) == n


def test_reader_ignores_orphan_chunks_not_in_header(spark):
    """A crashed second append (some tasks landed chunks, abort never ran)
    must stay invisible: readers trust the committed header's chunk list,
    never the directory listing."""
    d = tempfile.mkdtemp(prefix="tdpack_orph_")
    a = spark.range(10).select(F.col("id").alias("x"))
    a.coalesce(1).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()
    # simulate the orphan: a finished task's chunk from a job whose
    # driver died before commit()
    import struct

    with open(os.path.join(d, "part-00000-deadbeef.tdpack"), "wb") as f:
        f.write(b"TDP1")
        f.write(struct.pack("<I", 1) + bytes([2]) + struct.pack("<q", 999))
    back = spark.read.format("tdpack").option("path", d).load()
    assert back.count() == 10
    assert back.where(F.col("x") == 999).count() == 0


def test_abort_tolerates_none_commit_messages():
    from pyspark.sql.types import LongType, StructField, StructType

    from pandas_td_spark.sources.packstream import _PackWriter

    d = tempfile.mkdtemp(prefix="tdpack_ab_")
    schema = StructType([StructField("x", LongType())])
    w = _PackWriter({"path": d}, schema, overwrite=False)
    w.abort([None, None])  # failed tasks report None — must not raise


def test_timestamp_decode_is_exact_integer_microseconds():
    """fromtimestamp(us / 1e6) has ~0.5 µs float resolution at current
    epochs; decode must use integer math so every stored microsecond
    value round-trips exactly."""
    import datetime

    from pandas_td_spark.sources.packstream import _EPOCH

    # a value chosen so us/1e6 is NOT exactly representable in float64
    us = 1_700_000_000_000_001
    exact = _EPOCH + datetime.timedelta(microseconds=us)
    drift = datetime.datetime.fromtimestamp(
        us / 1_000_000, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    assert (exact - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
        microseconds=1
    ) == us
    # the old float path is allowed to agree for SOME values; the exact
    # path must agree for ALL — spot-check a sweep
    for delta in range(8):
        u = us + delta
        e = _EPOCH + datetime.timedelta(microseconds=u)
        back = (e - _EPOCH) // datetime.timedelta(microseconds=1)
        assert back == u
    del drift


def test_reader_refuses_uncommitted_dataset(spark):
    d = tempfile.mkdtemp(prefix="tdpack_unc_")
    with open(os.path.join(d, "part-00000-zz.tdpack"), "wb") as f:
        f.write(b"TDP1")
    with pytest.raises(Exception, match="_SUCCESS"):
        spark.read.format("tdpack").schema("x bigint").option(
            "path", d
        ).load().collect()


def test_events_timestamps_survive_transport(spark):
    src = spark.table("events").select("event_id", "ts", "event_type")
    d = tempfile.mkdtemp(prefix="tdpack_ts_")
    src.write.format("tdpack").option("path", d).mode("overwrite").save()
    back = spark.read.format("tdpack").option("path", d).load()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_stream_tails_new_chunks_exactly_once(spark):
    """Streaming half: chunks landed between micro-batches are each
    consumed exactly once (the reference's Streaming Import shape)."""
    import uuid

    d = tempfile.mkdtemp(prefix="tdpack_stream_")
    ck = tempfile.mkdtemp(prefix="tdpack_ck_")
    a = spark.range(10).select(F.col("id").alias("x"))
    a.coalesce(1).write.format("tdpack").option("path", d).mode(
        "overwrite"
    ).save()

    name = "s" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.format("tdpack")
        .schema("x bigint")
        .option("path", d)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = {r.x for r in spark.sql(f"select x from {name}").collect()}
    assert got1 == set(range(10))


def test_stream_offset_protocol_exactly_once():
    """Offset semantics drive exactly-once directly: chunks landed
    after an offset are read once, and readBetweenOffsets replays
    precisely the delta (what checkpoint recovery re-executes)."""
    import struct as _struct

    from pandas_td_spark.sources.packstream import (
        _MAGIC,
        _PackSimpleStreamReader,
    )
    from pyspark.sql.types import StructType

    d = tempfile.mkdtemp(prefix="tdpack_off_")

    def land(name, values):
        with open(os.path.join(d, name), "wb") as f:
            f.write(_MAGIC)
            for v in values:
                f.write(
                    _struct.pack("<I", 1)
                    + bytes([1])
                    + _struct.pack("<q", v)
                )

    schema = StructType.fromDDL("x bigint")
    r = _PackSimpleStreamReader({"path": d}, schema)
    o0 = r.initialOffset()
    land("part-00000-a.tdpack", [1, 2, 3])
    rows1, o1 = r.read(o0)
    assert [t[0] for t in rows1] == [1, 2, 3]
    land("part-00001-b.tdpack", [4, 5])
    rows2, o2 = r.read(o1)
    assert [t[0] for t in rows2] == [4, 5]  # batch 1 not replayed
    rows_idle, o3 = r.read(o2)
    assert rows_idle == [] and o3 == o2
    # recovery replay: exactly the delta between two offsets
    replay = [t[0] for t in r.readBetweenOffsets(o1, o2)]
    assert replay == [4, 5]
    # in-progress dotfiles are invisible until renamed
    land(".part-00002-c.tdpack.inprogress", [9])
    rows4, _ = r.read(o2)
    assert rows4 == []


def test_wire_format_property_round_trip():
    """Pure-codec property test: arbitrary rows (unicode, NULLs, int64
    extremes, NaN/inf doubles) survive the tdpack wire format exactly —
    no Spark session involved."""
    import math
    import struct as _struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pandas_td_spark.sources.packstream import (
        _MAGIC,
        _decode_file,
        _encode_row,
    )

    kinds = ["i64", "f64", "str", "bool"]
    row_st = st.tuples(
        st.none() | st.integers(-(2**63), 2**63 - 1),
        st.none() | st.floats(allow_nan=True, allow_infinity=True),
        st.none() | st.text(max_size=40),
        st.none() | st.booleans(),
    )

    @given(st.lists(row_st, max_size=8))
    @settings(max_examples=150, deadline=None)
    def check(rows):
        blob = _MAGIC + b"".join(_encode_row(r, kinds) for r in rows)
        with tempfile.NamedTemporaryFile(suffix=".tdpack") as f:
            f.write(blob)
            f.flush()
            got = list(_decode_file(f.name, kinds))
        assert len(got) == len(rows)
        for g, r in zip(got, rows):
            for gv, rv in zip(g, r):
                if isinstance(rv, float) and math.isnan(rv):
                    assert isinstance(gv, float) and math.isnan(gv)
                else:
                    assert gv == rv, (gv, rv)

    check()


def test_legacy_header_upgrade_recounts_exact_per_chunk_rows(spark):
    """ADVICE r9: upgrading a legacy header (no per-chunk counts) must
    RECOUNT the surviving chunks from their row structure — exact values,
    not an even amortization dressed as fact — including when a chunk has
    vanished (where the old path zeroed every surviving count)."""
    import json

    d = tempfile.mkdtemp(prefix="tdpack_legacy_")
    a = spark.range(90).select(F.col("id").alias("x"))
    # 3 uneven chunks: 90 rows over repartition(3) is even, so skew it
    a.repartition(3, F.col("x") % 7).write.format("tdpack").option(
        "path", d
    ).mode("overwrite").save()
    hp = os.path.join(d, "_tdpack_schema.json")
    with open(hp) as f:
        hdr = json.load(f)
    true_rows = dict(hdr["chunk_rows"])
    assert len(set(true_rows.values())) > 1, "fixture should be uneven"
    # simulate a legacy header: strip the per-chunk counts
    del hdr["chunk_rows"]
    with open(hp, "w") as f:
        json.dump(hdr, f)
    # and lose one chunk out-of-band (the old code zeroed ALL counts here)
    victim = sorted(true_rows)[0]
    os.remove(os.path.join(d, victim))
    b = spark.range(100, 107).select(F.col("id").alias("x"))
    b.repartition(1).write.format("tdpack").option("path", d).mode(
        "append"
    ).save()
    with open(hp) as f:
        hdr2 = json.load(f)
    for c, n in true_rows.items():
        if c != victim:
            assert hdr2["chunk_rows"][c] == n, "recount must be exact"
    back = spark.read.format("tdpack").option("path", d).load()
    assert hdr2["rows"] == back.count() == 90 - true_rows[victim] + 7
