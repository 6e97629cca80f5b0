"""pandas-td API-parity tests — same spirit as the reference's mocked-client
suite (SURVEY.md §5: test_td.py asserted generated-SQL / if_exists / proxy
behavior), but against the real local engine."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest

import pandas_td_spark as td


@pytest.fixture()
def con(spark):
    return td.connect(warehouse=tempfile.mkdtemp(prefix="wh_"), spark=spark)


def _seed(con):
    frame = pd.DataFrame(
        {
            "x": [1, 2, 3, 4],
            "y": ["a", "b", "a", "c"],
            "time": [100, 200, 300, 400],
        }
    )
    td.to_td(frame, "testdb.t1", con, if_exists="fail", index=False)
    return frame


def test_engine_url_parsing(con):
    e = td.create_engine("presto:mydb", con=con)
    assert (e.type, e.database) == ("presto", "mydb")
    e2 = td.create_engine("presto://key123@api.example.com/other", con=con)
    assert (e2.type, e2.database) == ("presto", "other")
    with pytest.raises(ValueError):
        td.create_engine("bogus", con=con)


def test_distributed_join_forces_partitioned_join(con):
    # round-1 advisor: the conf toggle was restored before the (lazy)
    # DataFrame materialized, so distributed_join silently never applied.
    # execute() now materializes inside the conf window — the pinned plan
    # must contain no broadcast join, and the conf must be restored after.
    _seed(con)
    td.to_td(
        pd.DataFrame({"y": ["a", "b", "c"], "z": [10, 20, 30]}),
        "testdb.dim1",
        con,
        if_exists="fail",
        index=False,
    )
    engine = td.create_engine("presto:testdb", con=con)
    before = con.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    rp = engine.execute(
        "SELECT t1.x, dim1.z FROM t1 JOIN dim1 ON t1.y = dim1.y",
        distributed_join=True,
    )
    plan = rp.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert con.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert sorted(rp.to_dataframe().z.tolist()) == [10, 10, 20, 30]
    rp.df.unpersist()


def test_roundtrip_query_and_table(con):
    frame = _seed(con)
    engine = td.create_engine("presto:testdb", con=con)
    out = td.read_td_query("SELECT x, y FROM t1 ORDER BY x", engine)
    assert out.x.tolist() == [1, 2, 3, 4]
    # read_td alias
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 4
    # generated scan: columns + time_range [start, end) + limit
    out2 = td.read_td_table(
        "t1", engine, columns=["x", "time"], time_range=(200, 400), limit=10
    )
    assert sorted(out2.x.tolist()) == [2, 3]
    assert list(out2.columns) == ["x", "time"]


def test_if_exists_matrix(con):
    frame = _seed(con)
    engine = td.create_engine("presto:testdb", con=con)
    with pytest.raises(Exception):
        td.to_td(frame, "testdb.t1", con, if_exists="fail", index=False)
    td.to_td(frame.head(1), "testdb.t1", con, if_exists="replace", index=False)
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 1
    td.to_td(frame, "testdb.t1", con, if_exists="append", index=False)
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 5
    with pytest.raises(ValueError):
        td.to_td(frame, "testdb.t1", con, if_exists="nope", index=False)
    with pytest.raises(ValueError):
        td.to_td(frame, "not_a_qualified_name", con, index=False)


def test_time_injection_and_index(con):
    frame = pd.DataFrame({"v": [1.0, 2.0]})
    td.to_td(
        frame, "testdb.t2", con, if_exists="replace",
        index_label="idx", time_value=42,
    )
    engine = td.create_engine("presto:testdb", con=con)
    out = td.read_td("SELECT idx, v, time FROM t2 ORDER BY idx", engine)
    assert out.time.tolist() == [42, 42]
    assert out.idx.tolist() == [0, 1]


def test_result_proxy_iteration_and_description(con):
    _seed(con)
    engine = td.create_engine("presto:testdb", con=con)
    rp = engine.execute("SELECT x, y FROM t1 ORDER BY x")
    assert [n for n, _ in rp.description] == ["x", "y"]
    rows = list(rp)
    assert rows[0] == (1, "a")
    # job re-attach (read_td_job)
    out = td.read_td_job(rp.job_id, engine)
    assert len(out) == 4


def test_catalog_listing(con):
    _seed(con)
    assert "testdb" in con.databases().name.tolist()
    t = con.tables("testdb")
    assert t.name.tolist() == ["t1"] and t["count"].tolist() == [4]


def test_params_and_index_col(con):
    _seed(con)
    engine = td.create_engine("presto:testdb", con=con)
    out = td.read_td_query(
        "SELECT x, y FROM t1 WHERE x >= :lo ORDER BY x",
        engine,
        index_col="x",
        params={"lo": 3},
    )
    assert out.index.tolist() == [3, 4]


def test_time_index(con):
    idx = pd.date_range("2024-01-01", periods=3, freq="D", name="ts")
    frame = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
    td.to_td(frame, "testdb.t3", con, if_exists="replace", time_index=0,
             index=False)
    engine = td.create_engine("presto:testdb", con=con)
    out = td.read_td("SELECT v, time FROM t3 ORDER BY time", engine)
    assert out.time.tolist() == [1704067200, 1704153600, 1704240000]


def test_atomic_replace_crash_consistency(con, spark):
    """A replace that dies mid-write must leave the previous snapshot
    committed and readable (manifest swap happens only after a complete
    snapshot write)."""
    import os

    from pandas_td_spark.sources.io import (
        resolve_data_path,
        write_table,
    )

    frame = _seed(con)
    engine = td.create_engine("presto:testdb", con=con)
    path = con.table_path("testdb", "t1")
    # replace migrates a plain-parquet table to manifest management
    td.to_td(frame.head(2), "testdb.t1", con, if_exists="replace", index=False)
    assert os.path.isfile(os.path.join(path, "_MANIFEST"))
    committed = resolve_data_path(path)
    assert committed != path
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 2

    # crash mid-write: a Python UDF that throws after the new version dir
    # is created but before the snapshot completes
    from pyspark.sql import functions as F

    def boom(_):
        raise RuntimeError("simulated executor failure")

    bad = spark.range(5).select(
        F.udf(boom, "string")("id").alias("x"),
        F.lit(1).cast("bigint").alias("time"),
    )
    with pytest.raises(Exception):
        write_table(bad, path, if_exists="replace")
    # the manifest still points at the last complete snapshot
    assert resolve_data_path(path) == committed
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 2

    # a successful replace commits a NEW version and prunes stale ones
    td.to_td(frame, "testdb.t1", con, if_exists="replace", index=False)
    assert resolve_data_path(path) != committed
    assert td.read_td("SELECT count(*) AS n FROM t1", engine).n[0] == 4
    versions = [d for d in os.listdir(path) if d.startswith("v-")]
    assert len(versions) <= 2  # current + previous, failures pruned


def test_snapshot_time_travel(con, spark):
    """S5c: read_snapshot reads retained older snapshots; retention follows
    keep_versions; pruned snapshots raise instead of silently reading."""
    import os

    from pandas_td_spark.sources.io import (
        read_snapshot,
        table_versions,
        write_table,
    )

    path = con.table_path("testdb", "tt")
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def snap(vals, keep):
        df = spark.createDataFrame([(v, 1) for v in vals], "x int, time bigint")
        write_table(df, path, if_exists="replace", keep_versions=keep)

    snap([1], keep=2)
    snap([1, 2], keep=2)
    snap([1, 2, 3], keep=2)
    vs = table_versions(path)
    assert len(vs) == 3  # current + 2 retained
    # age-indexed reads
    assert read_snapshot(spark, path, 0).count() == 3
    assert read_snapshot(spark, path, 1).count() == 2
    assert read_snapshot(spark, path, 2).count() == 1
    # named read matches age read
    assert read_snapshot(spark, path, vs[-1]).count() == 3
    with pytest.raises(ValueError):
        read_snapshot(spark, path, 3)
    # tighter retention prunes the tail but keeps the current snapshot
    snap([1, 2, 3, 4], keep=1)
    vs2 = table_versions(path)
    assert len(vs2) == 2
    assert read_snapshot(spark, path, 1).count() == 3
    with pytest.raises(ValueError):
        read_snapshot(spark, path, 2)
    # a non-managed path is refused
    with pytest.raises(ValueError):
        read_snapshot(spark, os.path.dirname(path), 0)


def test_merge_upsert_semantics_and_atomicity(spark, tmp_path):
    """S5d MERGE INTO: update-in-place, insert-new, delete-flagged, keep
    untouched — and a crashed merge leaves the previous snapshot committed."""
    from pandas_td_spark.sources.io import (
        merge_upsert,
        read_snapshot,
        resolve_data_path,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    merge_upsert(spark, base, path, keys=["id"])  # first merge = insert
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(resolve_data_path(path)).collect()}
    assert got == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}

    updates = spark.createDataFrame(
        [(2, "B", 22.0, False), (4, "d", 40.0, False), (3, None, 0.0, True)],
        "id long, name string, v double, is_delete boolean",
    )
    merge_upsert(
        spark, updates, path, keys=["id"], delete_col="is_delete",
        keep_versions=2,
    )
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(resolve_data_path(path)).collect()}
    # 1 untouched, 2 updated, 3 deleted, 4 inserted; is_delete not stored
    assert got == {1: ("a", 10.0), 2: ("B", 22.0), 4: ("d", 40.0)}
    assert "is_delete" not in spark.read.parquet(resolve_data_path(path)).columns
    # previous snapshot still readable (time travel across the merge)
    prev = {r.id for r in read_snapshot(spark, path, 1).collect()}
    assert prev == {1, 2, 3}

    # duplicate keys in one update batch are rejected (MERGE semantics),
    # not silently double-inserted
    with pytest.raises(ValueError, match="not unique"):
        merge_upsert(
            spark,
            spark.createDataFrame(
                [(7, "x", 1.0), (7, "y", 2.0)], "id long, name string, v double"
            ),
            path,
            keys=["id"],
        )

    # crash mid-merge: writer dies before the manifest flip → committed
    # snapshot unchanged
    import os

    committed_before = resolve_data_path(path)
    try:
        merge_upsert(
            spark,
            spark.createDataFrame([(9, None, 1.0)], "id long, name string, v double")
            .withColumn("v", F.col("v") / F.lit(0) + F.raise_error(F.lit("boom"))),
            path,
            keys=["id"],
        )
    except Exception:
        pass
    assert resolve_data_path(path) == committed_before
    got2 = {r.id for r in spark.read.parquet(resolve_data_path(path)).collect()}
    assert got2 == {1, 2, 4}


def test_read_file_tolerant_quarantines_corrupt_rows(spark, tmp_path):
    """S7b: PERMISSIVE ingest splits clean rows from a dead-letter feed
    without aborting and without a second input scan."""
    from pyspark.sql.types import LongType, StringType, StructType

    from pandas_td_spark.sources.io import read_file_tolerant

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken json line\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "not-a-number", "name": "bad type"}\n'
    )
    schema = (
        StructType().add("id", LongType()).add("name", StringType())
    )
    good, quarantine = read_file_tolerant(
        spark, str(p), fmt="json", schema=schema
    )
    assert sorted(r.id for r in good.collect()) == [1, 2]
    bad = [r.raw_record for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("broken" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_read_file_tolerant_mode_case_insensitive(spark, tmp_path):
    """Spark treats mode strings case-insensitively; the quarantine
    branch must too — mode='permissive' used to fall into the
    no-quarantine branch, surfacing corrupt rows as all-NULL good rows
    with an always-empty quarantine (advisor r5)."""
    from pyspark.sql.types import LongType, StringType, StructType

    from pandas_td_spark.sources.io import read_file_tolerant

    p = tmp_path / "feed.json"
    p.write_text('{"id": 1, "name": "ok"}\n{broken json line\n')
    schema = (
        StructType().add("id", LongType()).add("name", StringType())
    )
    good, quarantine = read_file_tolerant(
        spark, str(p), fmt="json", schema=schema, mode="permissive"
    )
    assert [r.id for r in good.collect()] == [1]
    assert quarantine.count() == 1


def test_read_file_tolerant_unpersist_releases_shared_scan(spark, tmp_path):
    """The two-filter split shares ONE cached scan; the returned handle
    must release it (repeated ingest calls would otherwise accumulate
    cached scans for the session's lifetime)."""
    from pyspark.sql.types import LongType, StringType, StructType

    from pandas_td_spark.sources.io import read_file_tolerant

    p = tmp_path / "feed.json"
    p.write_text('{"id": 1, "name": "ok"}\n')
    schema = StructType().add("id", LongType()).add("name", StringType())
    result = read_file_tolerant(spark, str(p), fmt="json", schema=schema)
    good, quarantine = result  # tuple-unpacking contract preserved
    assert good.count() == 1
    assert result._raw.storageLevel.useMemory  # cached while in use
    result.unpersist()
    assert not result._raw.storageLevel.useMemory


def test_read_file_tolerant_failfast_mode(spark, tmp_path):
    """Non-PERMISSIVE modes reject a corrupt-record column in the schema,
    so the corrupt column must NOT be injected there: FAILFAST reads
    clean input fine (empty quarantine) and raises on corrupt input."""
    import pytest as _pytest

    from pyspark.sql.types import LongType, StringType, StructType

    from pandas_td_spark.sources.io import read_file_tolerant

    schema = StructType().add("id", LongType()).add("name", StringType())

    clean = tmp_path / "clean.json"
    clean.write_text('{"id": 1, "name": "ok"}\n{"id": 2, "name": "b"}\n')
    good, quarantine = read_file_tolerant(
        spark, str(clean), fmt="json", schema=schema, mode="FAILFAST"
    )
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert quarantine.count() == 0

    dirty = tmp_path / "dirty.json"
    dirty.write_text('{"id": 1, "name": "ok"}\n{broken\n')
    good2, _ = read_file_tolerant(
        spark, str(dirty), fmt="json", schema=schema, mode="FAILFAST"
    )
    with _pytest.raises(Exception):
        good2.collect()


def test_read_binary_dir_binaryfile_ingest(spark, tmp_path):
    """S7c: binaryFile ingest — one row per file with BINARY content,
    glob pruning at listing time, length-capped payloads, and the typed
    media_meta struct (magic-byte format detection) attached."""
    from pandas_td_spark.sources.io import read_binary_dir

    png = bytes.fromhex("89504E470D0A1A0A") + b"fakepngbody"
    jpg = bytes.fromhex("FFD8FFE0") + b"fakejpgbody" * 100
    (tmp_path / "a.png").write_bytes(png)
    (tmp_path / "b.jpg").write_bytes(jpg)
    (tmp_path / "notes.txt").write_bytes(b"not media")

    df = read_binary_dir(spark, str(tmp_path), glob="*.{png,jpg}")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg"}
    assert bytes(rows["a.png"]["content"]) == png
    assert rows["a.png"]["media_meta"]["format"] == "png"
    assert rows["b.jpg"]["media_meta"]["format"] == "jpeg"
    assert rows["b.jpg"]["media_meta"]["n_bytes"] == len(jpg)

    # length cap keeps oversized payloads out-of-table (filter on the
    # length column, before content materializes)
    small = read_binary_dir(
        spark, str(tmp_path), glob="*.{png,jpg}", max_bytes=100
    )
    assert [r["path"].rsplit("/", 1)[-1] for r in small.collect()] == [
        "a.png"
    ]


def test_compact_table_small_files(spark, tmp_path):
    """S5e: compaction rewrites many small files into few, preserves the
    data bit-for-bit, keeps the previous snapshot readable (time travel
    across the compaction), and survives partitioned layouts."""
    from pandas_td_spark.sources.io import (
        compact_table,
        read_snapshot,
        table_versions,
        write_table,
    )

    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    # many tiny files: one per ~500 records
    write_table(
        df, p, if_exists="replace", time_value=0, max_records_per_file=500
    )
    from pandas_td_spark.sources.io import resolve_data_path

    before_rows = sorted(
        (r["id"], r["v"])
        for r in spark.read.parquet(resolve_data_path(p))
        .select("id", "v")
        .collect()
    )
    n_before, n_after = compact_table(spark, p, target_file_mb=1024)
    assert n_before > n_after
    assert n_after == 1  # 10k tiny rows fit one 1 GiB-target file
    after = spark.read.parquet(resolve_data_path(p))
    assert sorted(
        (r["id"], r["v"]) for r in after.select("id", "v").collect()
    ) == before_rows
    # previous snapshot retained and readable (keep_versions=1)
    vs = table_versions(p)
    assert len(vs) == 2
    old = read_snapshot(spark, p, vs[0])
    assert old.count() == 10_000


def test_compact_table_preserves_partitions_and_sorts(spark, tmp_path):
    from pandas_td_spark.sources.io import (
        compact_table,
        resolve_data_path,
        write_table,
    )

    from pyspark.sql import functions as F

    p = str(tmp_path / "tp")
    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("part")
    )
    write_table(
        df, p, if_exists="replace", time_value=0,
        max_records_per_file=200, partition_by=["part"],
    )
    n_before, n_after = compact_table(
        spark, p, target_file_mb=1024, sort_by=["id"]
    )
    assert n_after < n_before
    out = resolve_data_path(p)
    import os as _os

    assert any("part=" in d for d in _os.listdir(out)), (
        "hive partition layout must survive compaction"
    )
    after = spark.read.parquet(out)
    assert after.count() == 5_000
    assert set(after.columns) >= {"id", "part"}
