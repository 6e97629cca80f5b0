#!/usr/bin/env python
"""Regenerate the current round's measured section of BASELINE.md.

Runs bench.py (Spark side, median of 3 after warm-up — symmetric with
the comparator since r12) and a DuckDB comparator (median of 3 per oracle
query), then
rewrites everything below the marker line in BASELINE.md. Totals and the
per-query table stay directly comparable across rounds.

Usage: PYTHONPATH=. python tools/gen_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

MARKER = "<!-- gen_baseline:table -->"


DUCKDB_BUDGET_S = 120.0  # per-query watchdog: interrupt + skip beyond this


def duckdb_times(sf_dir: str) -> dict[str, float]:
    import threading

    import duckdb

    import __spark_entry__ as E

    from pandas_td_spark.sources.io import TABLES

    def connect() -> "duckdb.DuckDBPyConnection":
        c = duckdb.connect()
        c.execute("SET memory_limit='24GB'")
        # an interrupted spill-heavy query (q166 at sf0.1 spilled 80 GB)
        # must not fill the disk before the watchdog fires
        c.execute("SET max_temp_directory_size='8GB'")
        for t in TABLES:
            c.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return c

    con = connect()
    out: dict[str, float] = {}
    for name, sql in E.oracle_sql().items():
        runs = []
        interrupted = False
        for _ in range(3):
            # The watchdog must never interrupt an IDLE connection: a
            # Timer(con.interrupt) can fire after fetchall() returns but
            # before cancel(), leaving a pending interrupt that aborts
            # the NEXT query and silently drops its baseline entry. The
            # lock + flag make check-then-interrupt atomic against the
            # main thread marking the query finished.
            lock = threading.Lock()
            state = {"running": True, "fired": False}

            def _kill(c=con, lk=lock, st=state):
                with lk:
                    if st["running"]:
                        st["fired"] = True
                        c.interrupt()

            timer = threading.Timer(DUCKDB_BUDGET_S, _kill)
            timer.start()
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                runs.append(time.time() - t0)
            except duckdb.Error as ex:
                print(
                    f"  duckdb skip {name}: {type(ex).__name__} "
                    f"after {time.time() - t0:.0f}s",
                    file=sys.stderr,
                )
                interrupted = True
                break
            finally:
                with lock:
                    state["running"] = False
                timer.cancel()
            if state["fired"]:
                # belt-and-braces: if the timer did fire (even if the
                # query won the race and returned), the connection may
                # hold a pending interrupt — replace it.
                interrupted = True
                break
        if interrupted:
            # a partial runs list would publish a median over fewer
            # samples than every other query; drop the entry instead,
            # and reconnect so no pending interrupt leaks forward.
            con.close()
            con = connect()
        elif runs:
            out[name] = statistics.median(runs)
    con.close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_start = time.time()
    subprocess.run(
        [sys.executable, "bench.py"],
        env={
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "PYTHONPATH": ".",
        },
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py's STDOUT truncates the per-query map to fit the driver's
    # ~2 KB capture window; the complete map is the durable artifact it
    # writes alongside — read that, never the stdout line. Freshness
    # guard: if bench.py's artifact write failed (it warns and continues),
    # a stale file from the previous round would silently become the new
    # baseline — refuse instead.
    if os.path.getmtime("BENCH_LATEST.json") < bench_start:
        raise RuntimeError(
            "BENCH_LATEST.json was not refreshed by this bench run "
            "(write failed?) — refusing to publish stale timings"
        )
    with open("BENCH_LATEST.json") as f:
        bench = json.load(f)
    dd = duckdb_times(sf_dir)
    spark_total = sum(bench["queries"].values())
    dd_total = sum(dd.values())
    lines = [
        MARKER,
        "",
        f"Totals: **Spark {spark_total:.1f} s over "
        f"{len(bench['queries'])} queries**; **DuckDB {dd_total:.2f} s** "
        f"over the {len(dd)} oracle-expressible queries "
        "(both sides median-of-3 after warm-up — METHODOLOGY CHANGE "
        "r12: through r11 Spark was single-shot cold per query vs "
        "DuckDB's warm median; r12 totals are not comparable to r11 "
        "without bench.py's note. Cold totals stay in BENCH_LATEST.json).",
        "",
        "| query | spark_sec | duckdb_sec |",
        "|---|---|---|",
    ]
    for name in sorted(bench["queries"]):
        s = round(bench["queries"][name], 3)
        d = round(dd[name], 3) if name in dd else ""
        lines.append(f"| {name} | {s} | {d} |")
    text = open("BASELINE.md").read()
    head = text.split(MARKER)[0].rstrip()
    with open("BASELINE.md", "w") as fh:
        fh.write(head + "\n\n" + "\n".join(lines) + "\n")
    print(
        f"BASELINE.md updated: spark {spark_total:.1f}s / "
        f"{len(bench['queries'])} q, duckdb {dd_total:.2f}s / {len(dd)} q"
    )


if __name__ == "__main__":
    main()
