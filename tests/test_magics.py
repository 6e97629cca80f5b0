"""Magic arg-parsing / substitution tests (reference test_ipython.py
spirit — SURVEY §5) plus S7 format round-trips; no notebook required."""

from __future__ import annotations

import tempfile

import pytest

from pandas_td_spark.ipython import parse_magic_args, substitute_vars


def test_parse_magic_args():
    a = parse_magic_args("-o result -n presto:mydb")
    assert (a.out, a.dry_run, a.engine_url) == ("result", True, "presto:mydb")
    a = parse_magic_args("")
    assert (a.out, a.dry_run, a.quiet, a.engine_url) == (
        None,
        False,
        False,
        None,
    )
    a = parse_magic_args("--quiet -c con2")
    assert a.quiet and a.connection == "con2"


def test_substitute_vars():
    assert (
        substitute_vars("SELECT * FROM t WHERE x > {lo}", {"lo": 5})
        == "SELECT * FROM t WHERE x > 5"
    )
    # unknown tokens pass through untouched (SQL braces stay valid)
    assert substitute_vars("SELECT '{not_a_var}'", {}) == "SELECT '{not_a_var}'"


def test_file_format_roundtrips(spark):
    from pandas_td_spark.sources.io import read_file, write_file

    df = spark.range(100).selectExpr("id", "id * 2.5 AS v", "concat('k', id % 3) AS k")
    base = tempfile.mkdtemp(prefix="fmt_")
    for fmt in ("parquet", "csv", "json", "orc"):
        path = f"{base}/{fmt}"
        write_file(df, path, fmt=fmt)
        back = read_file(spark, path, fmt=fmt, schema=df.schema)
        assert back.count() == 100
        assert {f.name for f in back.schema} == {"id", "v", "k"}
        got = sorted(r.v for r in back.collect())
        assert got == sorted(r.v for r in df.collect())
    with pytest.raises(ValueError):
        write_file(df, base + "/x", fmt="msgpack")
