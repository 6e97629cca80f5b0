#!/usr/bin/env python
"""Whole-registry stage profile (guide §1: measure first).

One warm-up + one timed noop run per registered query in a UI-enabled
session; correlates the timed run's job group with the REST API and
writes /tmp/profile_all.json with, per query:

  wall        timed-run wall seconds
  njobs       jobs in the timed run (AQE materializations + broadcasts)
  nstages     non-skipped stages
  exec_sec    sum of executorRunTime over those stages (CPU-seconds)
  max_1task   largest executorRunTime of a single-task stage (serial
              bottleneck detector)
  input_mb    total stage inputBytes
  shuffle_mb  total shuffleWriteBytes

Usage: python tools/profile_all.py [name ...]   (default: all)
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_td_spark.engine.session import get_spark
    from pandas_td_spark.queries.registry import spark_queries
    from pandas_td_spark.sources.io import register_views

    spark = get_spark(
        app_name="profile_all", extra_confs={"spark.ui.enabled": "true"}
    )
    register_views(spark, sf_dir)
    qs = spark_queries()
    names = sys.argv[1:] or sorted(qs)
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    out: dict[str, dict] = {}
    for k, name in enumerate(names):
        fn = qs[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            try:
                sc._jvm.System.gc()
            except Exception:
                pass
            sc.setJobGroup(f"pa-{name}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            continue
        jobs = rest(f"applications/{app_id}/jobs?status=succeeded")
        mine = [j for j in jobs if j.get("jobGroup") == f"pa-{name}"]
        stage_ids = sorted({s for j in mine for s in j["stageIds"]})
        rec = {
            "wall": round(wall, 3),
            "njobs": len(mine),
            "nstages": 0,
            "exec_sec": 0.0,
            "max_1task": 0.0,
            "input_mb": 0.0,
            "shuffle_mb": 0.0,
        }
        for sid in stage_ids:
            try:
                sts = rest(f"applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st["status"] != "COMPLETE":
                    continue
                rec["nstages"] += 1
                e = (st.get("executorRunTime") or 0) / 1000.0
                rec["exec_sec"] += e
                if st.get("numCompleteTasks") == 1:
                    rec["max_1task"] = max(rec["max_1task"], e)
                rec["input_mb"] += (st.get("inputBytes") or 0) / 1e6
                rec["shuffle_mb"] += (st.get("shuffleWriteBytes") or 0) / 1e6
        for f in ("exec_sec", "max_1task", "input_mb", "shuffle_mb"):
            rec[f] = round(rec[f], 3)
        out[name] = rec
        if k % 25 == 0:
            print(f"[{k}/{len(names)}] {name} {wall:.2f}s", flush=True)

    with open("/tmp/profile_all.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /tmp/profile_all.json")


if __name__ == "__main__":
    main()
