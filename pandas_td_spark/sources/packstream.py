"""`tdpack` — a chunked binary record format as a pure-Python Spark
DataSource (reader AND writer), echoing the reference's record-stream
transport.

Reference parity: pandas-td's only data plane was row-oriented msgpack
record streams — results downloaded as msgpack chunks
(`pandas_td/td.py::ResultProxy`, ≈L330-420, UNVERIFIED — /root/reference
is empty) and uploads sent as msgpack.gz chunk files
(`td.py::StreamingUploader.upload_frame`, ≈L470-560, UNVERIFIED). This
module re-creates that surface ENGINE-NATIVE on Spark 4's Python
DataSource API (public: pyspark.sql.datasource): each executor task
writes one length-delimited binary chunk; the reader exposes one input
partition per chunk. The msgpack library itself isn't in this container,
so the wire format is a tagged little-endian encoding via the stdlib
``struct`` module — the framing/chunking semantics (self-describing
rows, schema header, atomic multi-chunk commit) are the point, not
msgpack's exact bytes.

Scale design: chunks are independent splits (reader parallelism = chunk
count, writer parallelism = upstream partitions); the only driver-side
work is the schema header and the commit marker — the standard
job-commit protocol (task files land under a jobid prefix, commit writes
`_SUCCESS` + header last, readers require `_SUCCESS`). Row-oriented
binary is the WRONG layout for analytics at rest (parquet is the
engine's native store); this source exists for transport parity —
ingest/egress of record streams — and the tests pin round-trips, not
scan speed.

Wire format per chunk file (``part-*.tdpack``):
  magic ``TDP1`` | repeated rows; per row: ``u32 n_fields`` then per
  field a tag byte — 0 NULL, 1 i64, 2 f64, 3 utf-8 (u32 len + bytes),
  4 bool(u8) — fields in schema order. Supported Spark types: Long/Int
  (widened to i64), Double, String, Boolean, Timestamp (as epoch µs
  i64, restored on read).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_MAGIC = b"TDP1"
# naive-UTC epoch for exact integer microsecond decode (see _decode_file)
import datetime as _dt  # noqa: E402

_EPOCH = _dt.datetime(1970, 1, 1)
_SCHEMA_FILE = "_tdpack_schema.json"
_SUCCESS_FILE = "_SUCCESS"

_T_NULL, _T_I64, _T_F64, _T_STR, _T_BOOL = 0, 1, 2, 3, 4


def _kind_of(dt) -> str:
    if isinstance(dt, (LongType, IntegerType)):
        return "i64"
    if isinstance(dt, DoubleType):
        return "f64"
    if isinstance(dt, StringType):
        return "str"
    if isinstance(dt, BooleanType):
        return "bool"
    if isinstance(dt, TimestampType):
        return "ts_us"
    if isinstance(dt, TimestampNTZType):
        return "ts_ntz_us"  # naive wall-clock, stored as epoch-style micros
    raise ValueError(f"tdpack does not support type {dt}")


def _encode_row(vals: Sequence, kinds: Sequence[str]) -> bytes:
    out = [struct.pack("<I", len(kinds))]
    for v, k in zip(vals, kinds):
        if v is None:
            out.append(bytes([_T_NULL]))
        elif k == "i64":
            out.append(bytes([_T_I64]) + struct.pack("<q", int(v)))
        elif k == "f64":
            out.append(bytes([_T_F64]) + struct.pack("<d", float(v)))
        elif k == "str":
            b = str(v).encode("utf-8")
            out.append(bytes([_T_STR]) + struct.pack("<I", len(b)) + b)
        elif k == "bool":
            out.append(bytes([_T_BOOL, 1 if v else 0]))
        elif k in ("ts_us", "ts_ntz_us"):
            # datetime -> epoch micros (UTC session discipline)
            import calendar

            us = (
                calendar.timegm(v.utctimetuple()) * 1_000_000
                + v.microsecond
                if hasattr(v, "utctimetuple")
                else int(v)
            )
            out.append(bytes([_T_I64]) + struct.pack("<q", us))
        else:  # pragma: no cover — _kind_of already rejects
            raise ValueError(k)
    return b"".join(out)


def _decode_file(path: str, kinds: Sequence[str]) -> Iterator[tuple]:
    import datetime

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"{path}: bad tdpack magic")
    pos = 4
    n = len(data)
    while pos < n:
        (nf,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals = []
        for i in range(nf):
            tag = data[pos]
            pos += 1
            if tag == _T_NULL:
                vals.append(None)
            elif tag == _T_I64:
                (x,) = struct.unpack_from("<q", data, pos)
                pos += 8
                if kinds[i] in ("ts_us", "ts_ntz_us"):
                    # integer math only: fromtimestamp(x / 1e6) has
                    # ~0.5 µs float resolution at current epochs and can
                    # round-trip stored microseconds off by one
                    x = _EPOCH + datetime.timedelta(microseconds=x)
                vals.append(x)
            elif tag == _T_F64:
                (x,) = struct.unpack_from("<d", data, pos)
                pos += 8
                vals.append(x)
            elif tag == _T_STR:
                (ln,) = struct.unpack_from("<I", data, pos)
                pos += 4
                vals.append(data[pos : pos + ln].decode("utf-8"))
                pos += ln
            elif tag == _T_BOOL:
                vals.append(bool(data[pos]))
                pos += 1
            else:
                raise ValueError(f"{path}: bad tag {tag} at {pos - 1}")
        yield tuple(vals)


def _count_rows(path: str, kinds: Sequence[str]) -> int:
    """Exact row count of one chunk, by running the one canonical wire
    parser (:func:`_decode_file`) and counting — used to upgrade legacy
    headers that lack per-chunk counts (ADVICE r9: amortized estimates
    would otherwise propagate as if exact through every later append).
    A one-time upgrade cost, so decoding values to count them is fine;
    keeping a second tag-walk here would fork the format definition."""
    return sum(1 for _ in _decode_file(path, kinds))


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _PackReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tdpack requires a 'path' option")
        self.kinds = [_kind_of(f.dataType) for f in schema.fields]

    def partitions(self):
        if not os.path.exists(os.path.join(self.path, _SUCCESS_FILE)):
            raise ValueError(
                f"{self.path}: no {_SUCCESS_FILE} — uncommitted or not a "
                "tdpack dataset"
            )
        # enumerate from the committed header's chunk list, NOT the
        # directory: a second append job that crashed after some tasks
        # finished (abort never ran) leaves orphan .tdpack chunks, and a
        # directory listing would serve them as committed data while the
        # first job's _SUCCESS still stands — breaking the "readers never
        # observe a partial dataset" protocol. commit() merges chunk
        # lists across appends, so the header is the full dataset.
        hdr = os.path.join(self.path, _SCHEMA_FILE)
        with open(hdr) as f:
            chunks = json.load(f)["chunks"]
        return [
            _ChunkPartition(os.path.join(self.path, c)) for c in sorted(chunks)
        ]

    def read(self, partition: _ChunkPartition):
        yield from _decode_file(partition.path, self.kinds)


class _PackCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class _PackWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tdpack requires a 'path' option")
        self.schema = schema
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]
        self.kinds = [_kind_of(f.dataType) for f in schema.fields]

    # runs on EXECUTORS — one chunk per task, landed under the job id so
    # a failed/speculative task never collides with a committed chunk
    def write(self, iterator) -> _PackCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{self.job_id}.tdpack"
        tmp = os.path.join(self.path, "." + name + ".inprogress")
        n = 0
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            for row in iterator:
                f.write(_encode_row(tuple(row), self.kinds))
                n += 1
        final = os.path.join(self.path, name)
        os.replace(tmp, final)
        return _PackCommit(name, n)

    # driver-side job commit: schema header + _SUCCESS written LAST, so
    # readers (which require _SUCCESS) never observe a partial dataset
    def commit(self, messages) -> None:
        # per-chunk row counts ride in the header so an append can sum
        # rows over exactly the chunks it keeps — carrying the previous
        # TOTAL forward would overstate the readable dataset whenever a
        # previously committed chunk file has since vanished (ADVICE r8)
        chunk_rows = {m.file: m.rows for m in messages if m is not None}
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".tdpack") and f not in chunk_rows:
                    os.remove(os.path.join(self.path, f))
        else:
            # append: merge with the previously committed chunk list so
            # readers (which trust the header, not the directory) see the
            # whole dataset across jobs — but only chunks that still exist
            hdr = os.path.join(self.path, _SCHEMA_FILE)
            if os.path.exists(hdr):
                with open(hdr) as f:
                    prev = json.load(f)
                prev_rows = prev.get("chunk_rows", {})
                survivors = [
                    c
                    for c in prev.get("chunks", [])
                    if os.path.exists(os.path.join(self.path, c))
                ]
                if prev_rows:
                    for c in survivors:
                        chunk_rows[c] = prev_rows.get(c, 0)
                else:
                    # legacy header without per-chunk counts: recount the
                    # survivors by scanning their row structure once —
                    # exact counts from here on, never estimates dressed
                    # as facts (ADVICE r9; the earlier even-amortization
                    # fabricated per-chunk numbers that then propagated
                    # as exact through every subsequent append)
                    for c in survivors:
                        chunk_rows[c] = _count_rows(
                            os.path.join(self.path, c), self.kinds
                        )
        header = {
            "fields": [
                {"name": f.name, "kind": k}
                for f, k in zip(self.schema.fields, self.kinds)
            ],
            "chunks": sorted(chunk_rows),
            "chunk_rows": {c: chunk_rows[c] for c in sorted(chunk_rows)},
            "rows": sum(chunk_rows.values()),
        }
        with open(os.path.join(self.path, _SCHEMA_FILE), "w") as f:
            json.dump(header, f, indent=1)
        with open(os.path.join(self.path, _SUCCESS_FILE), "w"):
            pass

    def abort(self, messages) -> None:
        # Spark passes None commit messages for tasks that never finished
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.file))
            except OSError:
                pass


class PackDataSource(DataSource):
    """``spark.read.format("tdpack")`` / ``df.write.format("tdpack")``."""

    @classmethod
    def name(cls) -> str:
        return "tdpack"

    def schema(self) -> str:
        # reader-side default schema from the committed header (callers
        # may still pass .schema(...) explicitly)
        path = self.options.get("path")
        hdr = os.path.join(path, _SCHEMA_FILE) if path else None
        if hdr and os.path.exists(hdr):
            kinds_to_ddl = {
                "i64": "bigint",
                "f64": "double",
                "str": "string",
                "bool": "boolean",
                "ts_us": "timestamp",
                "ts_ntz_us": "timestamp_ntz",
            }
            with open(hdr) as f:
                fields = json.load(f)["fields"]
            return ", ".join(
                f"{x['name']} {kinds_to_ddl[x['kind']]}" for x in fields
            )
        raise ValueError(
            "tdpack: pass .schema(...) or read a committed dataset "
            f"(missing {_SCHEMA_FILE})"
        )

    def reader(self, schema: StructType) -> _PackReader:
        return _PackReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> _PackWriter:
        return _PackWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return _PackSimpleStreamReader(self.options, schema)


def register_tdpack(spark) -> None:
    """Idempotently register the tdpack format on a session."""
    try:
        spark.dataSource.register(PackDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise


# ---------------------------------------------------------------------------
# Streaming half — the reference's Streaming Import surface
# (`td.py::StreamingUploader`, ≈L470-560, UNVERIFIED): producers land
# chunk files continuously; the engine tails the directory as a
# Structured Streaming source. Offsets are the sorted set of committed
# chunk names already processed (exactly the built-in file source's
# idea, restated for the tdpack commit protocol: only files named in
# the header-visible directory AND ending .tdpack count; in-progress
# dotfiles are invisible). readBetweenOffsets makes replay
# deterministic, so checkpoint recovery re-reads exactly the chunks of
# the uncommitted batch.
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


class _PackSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tdpack requires a 'path' option")
        self.kinds = [_kind_of(f.dataType) for f in schema.fields]

    def _chunks(self) -> list[str]:
        try:
            return sorted(
                f
                for f in os.listdir(self.path)
                if f.endswith(".tdpack") and not f.startswith(".")
            )
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._chunks() if f not in seen]
        # a LIST, not a generator: the runtime pickles the prefetched
        # batch for replay, and generators don't pickle. Micro-batch =
        # the newly-landed chunks, so this is batch-sized by definition.
        rows = [
            r
            for f in new
            for r in _decode_file(os.path.join(self.path, f), self.kinds)
        ]
        return rows, {"seen": sorted(seen | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("seen", []))
        replay = [f for f in end.get("seen", []) if f not in seen]
        for f in replay:
            yield from _decode_file(os.path.join(self.path, f), self.kinds)

    def commit(self, end: dict) -> None:
        pass  # offsets are pure file-name sets; nothing to release
