#!/usr/bin/env python
"""Refresh FINGERPRINTS.json — run at ROUND START, before editing queries.

For every query whose latest driver row certifies the CURRENT code (a
driver row exists and the query is not stale per the registry map), record
``source_fingerprint(fn)`` plus the certifying round. Stale queries keep
their previous record (or none) until a new driver row lands; the
fingerprint test treats a recorded-sha mismatch without a stale-map entry
as a failure, which is exactly the hole the round-7 post-bench rewrites
slipped through.

Invariant this relies on: at round start the working tree IS the tree the
driver just tested (the driver runs against the end-of-round snapshot).
Running this after editing query code would launder the edit into the
"certified" record — don't.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_td_spark.queries.registry import (  # noqa: E402
    _IMPL_CHANGED_SINCE_LAST_CHECK,
    _is_stale,
    _latest_driver_round,
    all_queries,
    certified_fingerprints,
    source_fingerprint,
)


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "FINGERPRINTS.json")
    latest = _latest_driver_round()
    prev = certified_fingerprints()
    out: dict[str, dict] = {}
    refreshed, kept, skipped = 0, 0, 0
    for name, q in sorted(all_queries().items()):
        row = latest.get(name)
        if row is None:
            skipped += 1  # never driver-checked; nothing is certified
            continue
        if _is_stale(name, latest):
            if name in prev:
                out[name] = prev[name]  # keep the last certified record
                kept += 1
            else:
                skipped += 1
            continue
        out[name] = {"sha": source_fingerprint(q.fn), "round": row[0]}
        refreshed += 1
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"FINGERPRINTS.json: {refreshed} refreshed, {kept} kept-stale, "
        f"{skipped} uncertified (total recorded {len(out)}); "
        f"stale map has {len(_IMPL_CHANGED_SINCE_LAST_CHECK)} entries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
