"""Mechanical stale-change detection (VERDICT r7 #2).

The hand-maintained ``_IMPL_CHANGED_SINCE_LAST_CHECK`` map failed in round
7: the end-of-round snapshot rewrote q85/q92/q110/q236 after the closing
bench/sweep and three of them were never added, so their standing driver
greens certified code that no longer existed. These tests make that class
of slip a test failure instead of a judge finding:

* ``test_no_silent_drift`` — every query whose latest driver row is green
  and whose recorded (certified) fingerprint differs from the current one
  MUST have a stale-map entry newer than the row.
* ``test_fingerprint_covers_shared_helpers`` — pins that the fingerprint
  includes transitively-referenced package helpers (the q92/q110 failure
  mode was a SHARED-helper rewrite, not an edit to the query functions).
"""

from __future__ import annotations

from pandas_td_spark.queries.registry import (
    _IMPL_CHANGED_SINCE_LAST_CHECK,
    _latest_driver_round,
    all_queries,
    certified_fingerprints,
    missing_fingerprints,
    source_fingerprint,
)


def test_fingerprints_file_present_and_fresh():
    fps = certified_fingerprints()
    assert fps, "FINGERPRINTS.json missing/empty — run tools/update_fingerprints.py"
    missing = missing_fingerprints()
    assert not missing, (
        f"certified queries without fingerprints: {sorted(missing)} — "
        "run tools/update_fingerprints.py (round-start step 0)"
    )


def test_fresh_driver_artifact_does_not_fail_freshness():
    """Regression for the r9/r10 artifact-lag failure (VERDICT r10 #1): a
    freshly-dropped CORRECTNESS_r{N}.json certifying a query introduced in
    round N must NOT trip the freshness check — the round-start fingerprint
    refresh can only run AFTER the artifact exists. Simulated with
    synthetic inputs so the test is independent of the working tree's
    artifact state."""
    fps = {"q_old": {"sha": "aaaa", "round": 9}}
    # q_new FIRST certified by the brand-new r10 artifact: exempt.
    latest = {"q_old": (10, "green"), "q_new": (10, "green")}
    first = {"q_old": 3, "q_new": 10}
    assert missing_fingerprints(fps, latest, {"q_old", "q_new"}, first) == set()
    # a query certified at-or-before the file's vintage with no record is
    # a genuine failure:
    latest_stale = {"q_old": (10, "green"), "q_forgot": (9, "green")}
    assert missing_fingerprints(
        fps, latest_stale, {"q_old", "q_forgot"}, {"q_old": 3, "q_forgot": 2}
    ) == {"q_forgot"}
    # and so is an OLD query whose record was lost, even when a fresh
    # whole-suite artifact re-certifies it at a round past the vintage
    # (r11 review: the exemption keys on FIRST round, not latest):
    latest_lost = {"q_old": (10, "green"), "q_lost": (10, "green")}
    assert missing_fingerprints(
        fps, latest_lost, {"q_old", "q_lost"}, {"q_old": 3, "q_lost": 4}
    ) == {"q_lost"}


def test_no_silent_drift():
    fps = certified_fingerprints()
    latest = _latest_driver_round()
    offenders = []
    for name, q in all_queries().items():
        rec = fps.get(name)
        row = latest.get(name)
        if rec is None or row is None:
            continue
        cur = source_fingerprint(q.fn)
        if cur == rec["sha"]:
            continue
        changed = _IMPL_CHANGED_SINCE_LAST_CHECK.get(name)
        if changed is None or changed <= rec["round"]:
            offenders.append(name)
    assert not offenders, (
        "queries changed since their certified fingerprint without a "
        f"stale-map entry: {sorted(offenders)} — add them to "
        "_IMPL_CHANGED_SINCE_LAST_CHECK with the current round"
    )


def test_fingerprint_covers_shared_helpers():
    """q85 calls curation helpers (_words/_ngrams); its fingerprint must
    change if any of those helper sources change. We can't edit sources in
    a test, so pin the mechanism: the helper sources are part of the
    hashed blob (fingerprint differs from hashing the bare function)."""
    import hashlib
    import inspect

    q = all_queries()["q85_repetition_stats"]
    bare = hashlib.sha256(inspect.getsource(q.fn).encode()).hexdigest()[:16]
    full = source_fingerprint(q.fn)
    assert full != bare, "fingerprint did not include any helper sources"


def test_fingerprint_covers_function_local_imports():
    """q156 pulls with_global_ntile via a FUNCTION-LOCAL ``from ... import``
    (never visible in __globals__); before round 11 a rank-helper rewrite
    would not have moved q156's fingerprint — the exact silent-drift class
    the system exists to catch. Pin that the bytecode import scan covers
    it, transitively into the helper's own callees."""
    from pandas_td_spark.queries.registry import fingerprint_sources

    srcs = fingerprint_sources(all_queries()["q156_rfm_segments"].fn)
    assert "pandas_td_spark.operators.ranking.with_global_ntile" in srcs
    # transitive: the helper's internal callees are covered too
    assert "pandas_td_spark.operators.ranking._boundary_buckets" in srcs


def test_all_modules_import_without_session():
    """The fingerprint walker's import scan SILENTLY skips modules that
    fail to import, so an import-time SparkContext dependency (the r11
    _geomean DDL-string bug) makes fingerprint coverage vary with
    session state. Structurally prevent the class: every package module
    must import in a bare subprocess with no Spark session."""
    import subprocess
    import sys

    code = (
        "import importlib, pkgutil, pandas_td_spark\n"
        "bad = []\n"
        "for m in pkgutil.walk_packages(pandas_td_spark.__path__,"
        " 'pandas_td_spark.'):\n"
        "    try:\n"
        "        importlib.import_module(m.name)\n"
        "    except Exception as e:\n"
        "        bad.append(f'{m.name}: {e}')\n"
        "assert not bad, bad\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"modules need a live session to import:\n{proc.stderr[-2000:]}"
    )


def test_fingerprint_deterministic():
    q = all_queries()["q01_pricing_summary"]
    assert source_fingerprint(q.fn) == source_fingerprint(q.fn)


def test_first_driver_round_is_earliest_artifact():
    """_first_driver_round (the fresh-artifact exemption's key) must
    report the EARLIEST artifact mentioning each query, bounded above by
    the latest round, and agree with a known round-1 row."""
    from pandas_td_spark.queries.registry import (
        _first_driver_round,
        _latest_driver_round,
    )

    first = _first_driver_round()
    latest = _latest_driver_round()
    assert first, "no artifacts parsed"
    assert set(latest) <= set(first)
    assert all(first[n] <= latest[n][0] for n in latest)
    # pinned against the committed round-1 artifact
    assert first["q61_range_join"] == 1
