#!/usr/bin/env python
"""Per-stage profile of registered queries (guide §1: measure first).

Runs each named query with the noop sink (warm-up + N timed runs) in a
UI-enabled session, then reads the Spark REST API for per-stage wall
time, task counts and shuffle/input volumes of the LAST timed run.

Usage: python tools/profile_query.py q01_pricing_summary [q02_...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def rest(path: str) -> object:
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_td_spark.engine.session import get_spark
    from pandas_td_spark.queries.registry import spark_queries
    from pandas_td_spark.sources.io import register_views

    spark = get_spark(
        app_name="profile_query", extra_confs={"spark.ui.enabled": "true"}
    )
    register_views(spark, sf_dir)
    qs = spark_queries()
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    for name in names:
        fn = qs[name]
        # warm-up run (codegen, caches) — untimed
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for i in range(runs):
            try:
                sc._jvm.System.gc()
            except Exception:
                pass
            sc.setJobGroup(f"prof-{name}-{i}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            print(f"== {name} run {i}: {wall:.3f}s")
        # correlate: jobs of the LAST group
        jobs = rest(f"applications/{app_id}/jobs")
        last = [j for j in jobs if j.get("jobGroup") == f"prof-{name}-{runs-1}"]
        stage_ids = sorted({s for j in last for s in j["stageIds"]})
        print(f"   jobs={len(last)} stages={len(stage_ids)}")
        for sid in stage_ids:
            try:
                sts = rest(f"applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st["status"] not in ("COMPLETE", "SKIPPED"):
                    continue
                if st["status"] == "SKIPPED":
                    print(f"   stage {sid} SKIPPED")
                    continue
                dur = (st.get("executorRunTime") or 0) / 1000.0
                sub = st.get("submissionTime", "")
                comp = st.get("completionTime", "")
                print(
                    f"   stage {sid:4d} tasks={st['numCompleteTasks']:3d} "
                    f"execRun={dur:7.3f}s "
                    f"in={st.get('inputBytes',0)/1e6:8.2f}MB "
                    f"sr={st.get('shuffleReadBytes',0)/1e6:8.2f}MB "
                    f"sw={st.get('shuffleWriteBytes',0)/1e6:8.2f}MB  "
                    f"{st.get('name','')[:60]}"
                )


if __name__ == "__main__":
    main()
