#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r15/.

Usage: python tools/dump_plans_r15.py <suffix> q108_gopher_verdict [...]

Writes plans/r15/<query>_<suffix>.txt (suffix = before|after). Runs at
sf0.1 (the bench scale) so the plan matches what the bench measures;
pre-AQE plan, same caveat as PLANS.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_td_spark.engine.session import get_spark
    from pandas_td_spark.queries.registry import spark_queries
    from pandas_td_spark.sources.io import register_views

    spark = get_spark(app_name="dump_plans_r15")
    register_views(spark, sf_dir)
    qs = spark_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
