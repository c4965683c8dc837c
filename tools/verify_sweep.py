"""Verify a driver-recorded correctness sweep against the query registry.

The r4 driver sweep silently recorded only 50 of 52 registered queries
(the registry's last two entries fell outside the sweep window). The
registry is now capped at 50 entries, and this tool makes the completeness
property CHECKABLE against what the driver actually recorded:

    python tools/verify_sweep.py CORRECTNESS_r05.json

exits non-zero if any registered query is missing from the sweep file, any
swept query is unknown to the registry, or any swept entry is red.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r05.json"
    from url_pattern_algorithm_spark.queries import ORACLES, QUERIES

    with open(path) as f:
        swept = json.load(f)
    registered, recorded = set(QUERIES), set(swept)
    ok = True
    missing = sorted(registered - recorded)
    if missing:
        print(f"FAIL: registered but not swept: {missing}")
        ok = False
    unknown = sorted(recorded - registered)
    if unknown:
        print(f"WARN: swept but not registered (stale names?): {unknown}")
    reds = []
    for name, rec in swept.items():
        if name not in registered:
            continue
        if name in ORACLES:
            if not (rec.get("rows_match") and rec.get("schema_match")
                    and rec.get("hash_match")):
                reds.append((name, rec.get("err")))
        elif not rec.get("spark_rows"):
            reds.append((name, "rows-only query returned no rows"))
    if reds:
        print(f"FAIL: red sweep entries: {reds}")
        ok = False
    print("sweep COMPLETE and green" if ok
          else f"{len(missing)} missing / {len(reds)} red")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
