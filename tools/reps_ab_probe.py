"""Targeted same-session interleaved A/B at configurable reps.

The repo's measurement protocol (BENCH/BASELINE.md §15/§25): only a
same-session reps>=4 interleave settles a suspicious single-query ratio on
this co-tenant box. bench.py's full A/B runs reps=2 over the whole headline
list; this probe re-measures a NAMED subset at higher reps against any tag.

Usage: python tools/reps_ab_probe.py <ref> <reps> <query> [query ...]
   -> prints one JSON line and writes BENCH/reps_ab_<ref>_<queries>.json
      (query names joined by '_', truncated to 60 chars)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "r3"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or ["url_normalize"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import _spark, run_ab_queries

    spark = _spark(f"local[{cpus}]")
    try:
        out = run_ab_queries(spark, sf_dir, ref, reps=reps, queries=names)
    finally:
        spark.stop()
    result = {"ref": ref, "reps": reps, "sf_dir": sf_dir, "queries": out}
    tag = "_".join(sorted(names))[:60]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", f"reps_ab_{ref}_{tag}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
