"""Sources & sinks (SURVEY.md §2.1 S1-S8).

Reference parity (all loci UNVERIFIED — /root/reference is empty):

* ``read_table``  ↔ ``pandas_td/td.py::read_td_table`` — projection +
  time-range + limit, generated as SQL text there; expressed declaratively
  here so Catalyst pushes projection/predicate/limit into the parquet scan.
* ``read_query``  ↔ ``pandas_td/td.py::read_td_query`` — arbitrary SQL.
* ``write_table`` ↔ ``pandas_td/td.py::to_td`` + ``StreamingUploader`` —
  ``if_exists`` ∈ {fail, replace, append}, ``time`` column injection.

Scale notes
-----------
* Tables are plain parquet files/directories; at 100 TB they would be
  dt-partitioned directories — :func:`read_table`'s time predicate is a
  simple range conjunction on a stable column, exactly the shape dynamic
  partition pruning consumes.
* ``write_table`` sizes output files via ``maxRecordsPerFile`` (the Spark
  analogue of the reference's 10 000-row upload chunks) instead of
  repartitioning, so no extra shuffle is introduced on the write path.
"""

from __future__ import annotations

import datetime as _dt
import os
import weakref
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.functions.td import (
    TimeLike,
    is_timestamp_dtype,
    td_time_range,
)

__all__ = [
    "TABLES",
    "table_path",
    "read_table",
    "read_query",
    "read_file",
    "write_file",
    "merge_upsert",
    "write_sorted",
    "write_time_partitioned",
    "read_time_partitioned",
    "write_bucketed_table",
    "write_table",
    "register_views",
    "resolve_data_path",
    "table_versions",
    "read_snapshot",
]

#: Fixture tables (TESTDATA.md); register_views exposes all of them.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_IF_EXISTS_TO_MODE = {
    "fail": "errorifexists",
    "replace": "overwrite",
    "append": "append",
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --------------------------------------------------------------------------
# Atomic replace: manifest-committed versioned directories.
#
# Plain ``mode("overwrite")`` deletes the old data before the new write
# finishes — a crash mid-replace loses BOTH copies (round-1 SURVEY §7
# risk). Delta/Iceberg solve this with a transaction log; neither is
# installed here, so we hand-roll the same core idea (a one-pointer log):
#
#   table.parquet/
#     _MANIFEST            <- one line: the committed version dir name
#     v-<n>-<uuid>/        <- immutable parquet snapshots
#
# Writers write a NEW version dir, then commit by atomically swapping
# _MANIFEST (os.replace — atomic on POSIX). Readers resolve _MANIFEST
# first; a crash at any point leaves it pointing at a complete snapshot.
# --------------------------------------------------------------------------
_MANIFEST = "_MANIFEST"


def resolve_data_path(path: str) -> str:
    """The directory actually holding committed data: the manifest's
    version dir for manifest-managed tables, ``path`` itself otherwise."""
    m = os.path.join(path, _MANIFEST)
    if os.path.isfile(m):
        with open(m) as fh:
            version = fh.read().strip()
        if version:
            return os.path.join(path, version)
    return path


def table_versions(path: str) -> list[str]:
    """Retained snapshot versions of a manifest-managed table, oldest
    first (names embed the commit time_ns, so lexicographic order is
    commit order). The last entry is the committed (current) snapshot."""
    if not os.path.isdir(path):
        return []
    current = _committed_version(path)
    vs = sorted(
        e
        for e in os.listdir(path)
        if e.startswith("v-") and os.path.isdir(os.path.join(path, e))
    )
    # a retained-but-uncommitted newer dir (crashed writer) is NOT a
    # readable snapshot; drop anything after the committed version
    if current in vs:
        vs = vs[: vs.index(current) + 1]
    return vs


def read_snapshot(
    spark: SparkSession, path: str, version: str | int = 0
) -> DataFrame:
    """Time-travel read of a manifest-managed table (S5c).

    ``version`` is either an explicit version-dir name from
    :func:`table_versions`, or an integer age: ``0`` = the committed
    snapshot, ``1`` = the one before it, … Raises ``ValueError`` when the
    requested snapshot is not retained (pruned by ``keep_versions``).
    Snapshots are immutable directories, so a reader holding version N is
    unaffected by concurrent ``replace`` commits — the same isolation
    argument as Iceberg/Delta snapshot reads, scoped to the one-pointer
    manifest protocol used here.
    """
    vs = table_versions(path)
    if isinstance(version, int):
        if not vs:
            raise ValueError(f"{path} is not a manifest-managed table")
        if version < 0 or version >= len(vs):
            raise ValueError(
                f"snapshot {version} not retained (have {len(vs)}: 0..{len(vs) - 1})"
            )
        name = vs[-1 - version]
    else:
        if version not in vs:
            raise ValueError(
                f"snapshot {version!r} not retained; available: {vs}"
            )
        name = version
    return spark.read.parquet(os.path.join(path, name))


def _committed_version(path: str) -> str | None:
    m = os.path.join(path, _MANIFEST)
    if os.path.isfile(m):
        with open(m) as fh:
            v = fh.read().strip()
        return v or None
    return None


def _commit_manifest(path: str, version: str) -> None:
    """Atomically point _MANIFEST at ``version`` (write-temp + rename)."""
    import uuid as _uuid

    tmp = os.path.join(path, f".manifest.{_uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        fh.write(version + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _atomic_replace(
    df: DataFrame, path: str, write_fn, keep_versions: int = 1
) -> None:
    """Write a new snapshot under ``path`` and commit it atomically.
    ``write_fn(target_dir)`` performs the actual (errorifexists) write.
    Old snapshots beyond ``keep_versions`` are pruned AFTER the commit —
    in-flight readers of the immediately-previous snapshot keep working."""
    import time as _time
    import uuid as _uuid

    os.makedirs(path, exist_ok=True)
    version = f"v-{_time.time_ns():020d}-{_uuid.uuid4().hex[:8]}"
    write_fn(os.path.join(path, version))
    _commit_manifest(path, version)
    # migration: a pre-manifest plain-parquet table has loose data files at
    # the root — stale now that the manifest is authoritative.
    # Retention: the committed snapshot plus the ``keep_versions`` most
    # recent older ones (version names embed time_ns, so the lexicographic
    # order IS the commit order) — those stay readable via read_snapshot.
    older = sorted(
        (
            e
            for e in os.listdir(path)
            if e.startswith("v-")
            and e != version
            and os.path.isdir(os.path.join(path, e))
        ),
        reverse=True,
    )
    survivors = {version, *older[: max(keep_versions, 0)]}
    import shutil

    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry == _MANIFEST or entry in survivors:
            continue
        if entry.startswith("v-") and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        elif os.path.isfile(full) and not entry.startswith("."):
            os.unlink(full)


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS). Spark 4.x cannot read
    those as timestamps (PARQUET_TYPE_ILLEGAL); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as BIGINT
    nanos. Footer inspection is driver-side and O(footers), not O(data)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing ns-timestamp columns back to
    TimestampType (µs) — lossless when sub-µs components are zero, which
    holds for the driver fixtures (verified via DuckDB ``epoch_ns % 1000``)."""
    path = resolve_data_path(table_path(sf_dir, name))
    df = spark.read.parquet(path)
    for c in _ns_timestamp_columns(path):
        if dict(df.dtypes).get(c) == "bigint":
            # integer `div`: double division would lose precision at
            # ~1.7e18 ns (beyond double's 53-bit mantissa)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: Sequence[str] | None = None,
    time_range: tuple[TimeLike, TimeLike] | None = None,
    time_col: str = "time",
    limit: int | None = None,
) -> DataFrame:
    """S1: scan with projection, time predicate, limit.

    The reference generated ``SELECT {cols} FROM t WHERE td_time_range(time,
    s, e) LIMIT n`` (default limit 10 000) and shipped it to Presto. Here the
    same plan is declared and Catalyst pushes each piece down: check
    ``.explain`` for ``PushedFilters`` + pruned ``ReadSchema``.

    ``time_col`` may name an epoch-seconds BIGINT column (TD convention), a
    TIMESTAMP column, or a raw parquet TIMESTAMP(NANOS) column (the
    ``events.ts`` fixture). In the nanos case the predicate is applied to the
    raw BIGINT **before** normalization, as a plain ``>= / <`` literal
    comparison — the shape the parquet reader pushes down to row-group
    statistics (check ``PushedFilters`` in ``.explain``).
    """
    path = resolve_data_path(table_path(sf_dir, name))
    raw = spark.read.parquet(path)
    ns_cols = [
        c for c in _ns_timestamp_columns(path) if dict(raw.dtypes).get(c) == "bigint"
    ]
    df = raw
    if time_range is not None:
        start, end = time_range
        from pandas_td_spark.functions.td import to_epoch_seconds

        s, e = to_epoch_seconds(start), to_epoch_seconds(end)
        t = F.col(time_col)
        if time_col in ns_cols:
            # pushable: literal bounds scaled to the stored unit
            cond = F.lit(True)
            if s is not None:
                cond = cond & (t >= F.lit(s * 1_000_000_000))
            if e is not None:
                cond = cond & (t < F.lit(e * 1_000_000_000))
            df = df.where(cond)
        else:
            dtype = dict(df.dtypes).get(time_col)
            if is_timestamp_dtype(dtype):
                # compare the column bare against a constant-folded literal
                # of the SAME timestamp flavor (ntz or tz) — wrapping the
                # column in unix_timestamp() would block parquet pushdown.
                # Session tz is UTC, so ntz wall-clock == UTC instant.
                cond = F.lit(True)
                if s is not None:
                    cond = cond & (t >= F.timestamp_seconds(F.lit(s)).cast(dtype))
                if e is not None:
                    cond = cond & (t < F.timestamp_seconds(F.lit(e)).cast(dtype))
                df = df.where(cond)
            else:
                df = df.where(td_time_range(t, s, e))
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if columns:
        df = df.select(*columns)
    if limit is not None:
        df = df.limit(limit)
    return df


def read_query(spark: SparkSession, sql: str, **kwargs) -> DataFrame:
    """S2: arbitrary SQL against registered views. ``kwargs`` become named
    parameters (Spark ≥3.4 parameterized SQL) — the analogue of the
    reference's ``params=``/magic ``{var}`` substitution without string
    injection."""
    return spark.sql(sql, args=kwargs) if kwargs else spark.sql(sql)


def write_table(
    df: DataFrame,
    path: str,
    if_exists: str = "fail",
    time_col: str | None = None,
    time_value: int | None = None,
    max_records_per_file: int = 1_000_000,
    partition_by: Sequence[str] | None = None,
    keep_versions: int = 1,
) -> None:
    """S5: bulk sink with the reference's ``if_exists`` semantics.

    * ``time_col``: convert that column to epoch-seconds BIGINT ``time``.
    * neither given: inject ``time_value`` (explicit, deterministic — the
      reference injected wall-clock `now`, which we refuse to do silently).
    * ``replace`` is ATOMIC: the new snapshot is written to a fresh version
      directory and committed by an atomic manifest swap (see
      :func:`_atomic_replace`) — a crash mid-replace leaves the previous
      snapshot committed and readable. ``append``/``fail`` operate on the
      committed snapshot via :func:`resolve_data_path`.
    """
    if if_exists not in _IF_EXISTS_TO_MODE:
        raise ValueError(
            f"if_exists must be one of {sorted(_IF_EXISTS_TO_MODE)}, got {if_exists!r}"
        )
    if time_col is not None:
        src = F.col(time_col)
        if is_timestamp_dtype(dict(df.dtypes).get(time_col)):
            src = F.unix_timestamp(src)
        df = df.withColumn("time", src.cast("bigint"))
    elif "time" not in df.columns:
        if time_value is None:
            raise ValueError(
                "no `time` column: pass time_col= or an explicit time_value="
            )
        df = df.withColumn("time", F.lit(int(time_value)).cast("bigint"))
    def _write(target: str, mode: str) -> None:
        writer = df.write.mode(mode).option(
            "maxRecordsPerFile", max_records_per_file
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

    if if_exists == "replace":
        _atomic_replace(
            df,
            path,
            lambda target: _write(target, "errorifexists"),
            keep_versions=keep_versions,
        )
    else:
        _write(resolve_data_path(path), _IF_EXISTS_TO_MODE[if_exists])


_FORMATS = ("parquet", "csv", "json", "orc")


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """S7: format-generic source. The reference client spoke msgpack(.gz)
    only (StreamingUploader); Spark's source API gives parquet/CSV/JSON/ORC
    for free — CSV/JSON default to header/inference unless a schema is
    passed (always pass one in production: inference is an extra full
    scan)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
    with_meta: bool = True,
) -> DataFrame:
    """S7c: raw-media ingest via Spark's ``binaryFile`` source — the entry
    point of the multimodal pipeline (operators/multimodal.py). Yields
    one row per file: (path, modificationTime, length, content BINARY),
    plus the typed ``media_meta`` struct (size/digest/magic-byte format —
    JVM expressions) when ``with_meta``.

    Scale notes: ``pathGlobFilter`` prunes at LISTING time (never reads
    skipped files); ``max_bytes`` maps to the source's
    ``spark.sql.sources.binaryFile.maxLength`` contract by filtering on
    the ``length`` column BEFORE content is materialized — the filter
    pushes to the file index, so oversized payloads (>2 GB hard limit)
    stay out-of-table as URI rows per the multimodal convention. One
    task per file; explicit ``repartition`` after load when many small
    files should be coalesced."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= F.lit(int(max_bytes)))
    if with_meta:
        from pandas_td_spark.operators.multimodal import media_meta

        df = df.withColumn("media_meta", media_meta(F.col("content")))
    return df


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    **options,
) -> None:
    """S7 sink twin of :func:`read_file`."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt == "csv":
        options.setdefault("header", "true")
    df.write.mode(mode).options(**options).format(fmt).save(path)


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    delete_col: str | None = None,
    keep_versions: int = 1,
) -> None:
    """MERGE INTO semantics on a manifest-managed table (S5d): rows in
    ``updates`` replace target rows with matching ``keys``; unmatched
    update rows insert; target rows without a match survive unchanged.
    When ``delete_col`` names a boolean column, update rows with it true
    DELETE their key instead (the column is dropped from storage) — the
    CDC apply shape.

    Atomicity rides :func:`_atomic_replace`: the merged result is written
    as a fresh snapshot and committed by the one-pointer manifest swap, so
    a crash mid-merge leaves the previous snapshot intact and readable.

    Plan shape at scale: one left-anti join (target minus touched keys)
    unioned with the surviving updates — the anti join shuffles on the
    merge keys, the same cost class as any keyed join; nothing driver-side.
    A first merge against a non-existent path is just an insert.

    ``updates`` must be unique on ``keys`` — like SQL MERGE's
    multiple-match error. Two CDC rows for one key in a batch would
    otherwise both insert (silent duplication); the check is one cheap
    aggregation on the (small) update side. Pre-collapse with keep-last
    (e.g. a max_by over a version column) before calling when duplicates
    are expected."""
    keys = list(keys)
    dup = (
        updates.groupBy(*keys)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        dup_key = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"updates are not unique on {keys}: e.g. {dup_key} appears "
            "multiple times; collapse to one row per key first"
        )
    survivors = updates
    if delete_col is not None:
        survivors = updates.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    target_path = resolve_data_path(path)
    base_exists = os.path.isdir(target_path) and any(
        not e.startswith(".") and e != _MANIFEST
        for e in os.listdir(target_path)
    )
    if base_exists:
        target = spark.read.parquet(target_path)
        touched = updates.select(*keys).distinct()
        kept = target.join(touched, on=keys, how="left_anti")
        merged = kept.unionByName(survivors)
    else:
        merged = survivors
    # the new snapshot scans the OLD committed snapshot while writing the
    # new version dir — safe: the write targets a fresh directory and the
    # manifest flips only after success
    _atomic_replace(
        merged,
        path,
        lambda t: merged.write.mode("errorifexists").parquet(t),
        keep_versions=keep_versions,
    )


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_by: Sequence[str] | None = None,
    keep_versions: int = 1,
) -> tuple[int, int]:
    """S5e: OPTIMIZE-style small-files compaction of a (manifest-managed
    or plain) parquet table — the maintenance op every streaming/CDC
    ingest path needs, since per-microbatch and per-merge writes
    accumulate files far below the scan-efficient size. Rewrites the
    committed snapshot into ``ceil(total_bytes / target_file_mb)`` files
    (per partition directory when hive-partitioned — partition layout is
    preserved) and commits via the atomic manifest swap, so a crash
    mid-compaction leaves the previous snapshot readable and time-travel
    across the compaction keeps working. Data is bit-identical; only the
    file layout changes.

    ``sort_by`` additionally range-clusters rows across the output files
    (one range shuffle — the same cost the rewrite's repartition pays
    anyway) so min/max row-group stats become selective on those columns
    (write_sorted's discipline applied at maintenance time).

    Returns ``(files_before, files_after)``. Scale note: the rewrite is
    one full scan + one shuffle of the table — schedule it like any
    OPTIMIZE; readers are never blocked (snapshot isolation via the
    manifest pointer). Writer exclusion is the caller's job: an append
    committed into the PREVIOUS snapshot while the compaction rewrite is
    in flight is not carried into the compacted snapshot (the same
    lost-update window every last-writer-wins snapshot swap has — Delta/
    Iceberg close it with commit-conflict detection); don't run
    compaction concurrently with writers."""
    import math

    src_dir = resolve_data_path(path)
    files = []
    part_cols: set[str] = set()
    for root, dirs, names in os.walk(src_dir):
        for d in dirs:
            if "=" in d:
                part_cols.add(d.split("=", 1)[0])
        files.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(".")
        )
    if not files:
        raise ValueError(f"{path} has no committed parquet data")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    if sort_by:
        cols = [F.col(c) for c in sort_by]
        df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_out)

    def _write(target: str) -> None:
        writer = df.write.mode("errorifexists")
        if part_cols:
            writer = writer.partitionBy(*sorted(part_cols))
        writer.parquet(target)

    _atomic_replace(df, path, _write, keep_versions=keep_versions)
    out_dir = resolve_data_path(path)
    n_after = sum(
        1
        for root, _, names in os.walk(out_dir)
        for n in names
        if n.endswith(".parquet") and not n.startswith(".")
    )
    return len(files), n_after


def write_sorted(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    num_files: int | None = None,
    mode: str = "errorifexists",
) -> None:
    """Globally-ordered export: range-repartition on the sort keys (one
    sampling pass picks balanced split points), then sort within each
    partition — file N's keys all precede file N+1's, and each file is
    internally sorted. This is THE scalable substitute for a global
    ``orderBy`` collect: no single reducer ever sees the full dataset, and
    downstream parquet readers get min/max row-group statistics that make
    key-range predicates prune to a handful of files. At 100 TB the cost
    is one shuffle — the same as any aggregation — instead of a
    driver-side sort that cannot exist."""
    parts = df.repartitionByRange(*by) if num_files is None else (
        df.repartitionByRange(num_files, *by)
    )
    parts.sortWithinPartitions(*by).write.mode(mode).parquet(path)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """TD table layout at scale: the reference's hourly time-bucketed
    storage (Plazma) maps to a date-partitioned parquet table with an
    epoch-seconds ``time`` column. Writes ``dt=YYYY-MM-DD/`` directories;
    :func:`read_time_partitioned` turns a time range into partition
    pruning + row-group skipping."""
    src = F.col(ts_col)
    if is_timestamp_dtype(dict(df.dtypes).get(ts_col)):
        out = df.withColumn("time", F.unix_timestamp(src).cast("bigint"))
    else:
        out = df.withColumn("time", src.cast("bigint"))
    out = out.withColumn(
        "dt", F.date_format(F.timestamp_seconds(F.col("time")), "yyyy-MM-dd")
    )
    out.write.mode(mode).partitionBy("dt").parquet(path)


def read_time_partitioned(
    spark: SparkSession,
    path: str,
    time_range: tuple[TimeLike, TimeLike] | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Scan a :func:`write_time_partitioned` table. The time predicate is
    emitted twice: on the ``dt`` partition column (directory-level pruning
    — whole days never touch disk) and on ``time`` (row-group skipping
    within the boundary days). ``.explain`` shows both ``PartitionFilters``
    and ``PushedFilters`` — the shape that makes a 100 TB history table
    cost O(scanned window), not O(table)."""
    df = spark.read.parquet(path)
    if time_range is not None:
        from pandas_td_spark.functions.td import to_epoch_seconds

        s, e = (to_epoch_seconds(v) for v in time_range)
        cond = F.lit(True)
        if s is not None:
            day = _dt.datetime.fromtimestamp(s, _dt.timezone.utc).strftime(
                "%Y-%m-%d"
            )
            cond = cond & (F.col("dt") >= F.lit(day)) & (F.col("time") >= F.lit(s))
        if e is not None:
            # end-exclusive on time; dt is day-granular so <= end's day
            day = _dt.datetime.fromtimestamp(e, _dt.timezone.utc).strftime(
                "%Y-%m-%d"
            )
            cond = cond & (F.col("dt") <= F.lit(day)) & (F.col("time") < F.lit(e))
        df = df.where(cond)
    if columns:
        df = df.select(*columns)
    return df


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (SURVEY scale notes: "bucketing for
    co-located joins"). Two tables bucketed (and sorted) the same way on
    the join key sort-merge-join with NO exchange and no sort — the
    pre-shuffle is paid once at write time, every subsequent join reuses
    it. That's the canonical answer for a fact table joined repeatedly on
    the same key at 100 TB. Requires ``saveAsTable`` (bucketing metadata
    lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(name)


# weak keys: a dict keyed by id(spark) can alias a NEW session that reuses
# a garbage-collected session's id (falsely skipping registration) and
# leaks an entry per session (round-1 advisor finding)
_CURRENT_VIEWS: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_views(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> None:
    """S6-adjacent: expose every fixture table as a temp view so the SQL
    surface (``read_query``/oracle parity) sees the same names DuckDB does.

    Skipped when this session's views already point at ``sf_dir``: every
    registered query calls this, and re-creating 10 views (schema reads +
    catalog round-trips) per query was measurable wall-clock in the bench
    loop. Switching ``sf_dir`` re-registers (view names are shared);
    ``force=True`` refreshes after external changes to the directory.
    """
    target = os.path.abspath(sf_dir)
    if not force and _CURRENT_VIEWS.get(spark) == target:
        return
    # a forced refresh (or dir switch) must also invalidate any memoized
    # derived state keyed on (session, view dir) — the graph edge cache
    # would otherwise serve checkpointed edges built from the OLD files
    try:
        from pandas_td_spark.queries.advanced import evict_edge_cache
        from pandas_td_spark.queries.curation import (
            evict_bpe_cache,
            evict_dsir_cache,
        )
        from pandas_td_spark.queries.llm import evict_pairs_cache

        for evict in (
            evict_edge_cache,
            evict_pairs_cache,
            evict_bpe_cache,
            evict_dsir_cache,
        ):
            evict(spark, _CURRENT_VIEWS.get(spark))
            if force:
                evict(spark, target)
    except Exception:
        pass  # queries package optional for bare-io users
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            _load(spark, sf_dir, name).createOrReplaceTempView(name)
    _CURRENT_VIEWS[spark] = target


class TolerantRead(tuple):
    """``(good, quarantine)`` pair from :func:`read_file_tolerant`, plus
    an ``unpersist()`` handle for the shared cached scan both frames
    filter. Unpacks like a plain 2-tuple for backwards compatibility."""

    def __new__(cls, good, quarantine, raw=None):
        self = super().__new__(cls, (good, quarantine))
        self.good = good
        self.quarantine = quarantine
        self._raw = raw
        return self

    def unpersist(self, blocking: bool = False) -> "TolerantRead":
        if self._raw is not None:
            self._raw.unpersist(blocking)
        return self


def read_file_tolerant(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    schema=None,
    corrupt_col: str = "_corrupt_record",
    **options,
):
    """S7b: error-tolerant semi-structured ingest. Reads CSV/JSON in
    PERMISSIVE mode with the raw text of every unparseable row captured
    in ``corrupt_col``, and returns ``(good, quarantine)`` DataFrames:
    rows that parsed cleanly (corrupt column dropped) and the raw
    corrupt lines for a dead-letter sink. The split is two filters over
    ONE cached scan — no second pass over the input, no job abort on a
    single bad byte, which is the ingest contract a 100 TB loader needs.
    A schema is required: column NULLability can't distinguish "parsed
    NULL" from "failed parse" without the corrupt column, and inference
    would cost an extra scan.

    FAILFAST/DROPMALFORMED are opt-in via ``options={'mode': ...}``; in
    those modes Spark REJECTS a corrupt-record column in the schema, so
    the corrupt column is only injected under PERMISSIVE and the
    quarantine frame comes back empty (FAILFAST throws on the first bad
    row, DROPMALFORMED silently drops them — no rows to quarantine).

    Returns a ``TolerantRead`` — unpacks as ``(good, quarantine)`` and
    adds ``.unpersist()`` to release the shared cached scan once both
    sides are consumed. Repeated ingest calls that skip it accumulate
    cached scans for the session's lifetime (``good.unpersist()`` would
    NOT help: the cache lives on the parent scan, not the filtered
    children).
    """
    if fmt not in ("csv", "json"):
        raise ValueError(f"tolerant read supports csv/json, got {fmt!r}")
    if schema is None:
        raise ValueError("read_file_tolerant requires an explicit schema")
    from pyspark.sql.types import StringType, StructType

    if not isinstance(schema, StructType):
        raise TypeError("schema must be a StructType")
    options.setdefault("mode", "PERMISSIVE")
    # Spark accepts mode strings case-insensitively; normalize before
    # branching so mode="permissive" still gets the corrupt-column
    # injection instead of silently surfacing bad rows as all-NULL rows
    # with an always-empty quarantine.
    options["mode"] = options["mode"].upper()
    if fmt == "csv":
        options.setdefault("header", "true")
    if options["mode"] != "PERMISSIVE":
        # corrupt-column injection is PERMISSIVE-only (Spark errors
        # otherwise: "columnNameOfCorruptRecord ... in non-PERMISSIVE
        # mode"); no caching either — there is only one consumer.
        good = (
            spark.read.schema(schema).options(**options).format(fmt).load(path)
        )
        quarantine = spark.createDataFrame(
            [], "raw_record string"
        )
        return TolerantRead(good, quarantine)
    full = StructType(schema.fields[:]).add(corrupt_col, StringType())
    options["columnNameOfCorruptRecord"] = corrupt_col
    raw = (
        spark.read.schema(full).options(**options).format(fmt).load(path)
    ).cache()
    good = raw.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = raw.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    return TolerantRead(good, quarantine, raw)
