"""Normalize-UDF-stage scaling probe (backs BENCH/BASELINE.md's best-scaling
row with a committed measurement file — ADVICE r1).

Isolates the pure Arrow-UDF stage: candidate URL -> strip-session ->
RFC-3986 -> canonical sort -> xxhash64, no shuffle downstream (count only).
Interleaved local[8]/local[32] legs in fresh processes, per-leg BEST.

Usage: python tools/normalize_probe.py [n_urls] [reps] -> BENCH/normalize_scaling.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEG = r"""
import json, sys, time
sys.path.insert(0, ".")
from url_pattern_algorithm_spark.session import get_spark
from url_pattern_algorithm_spark.functions.udfs import with_url_columns
from pyspark.sql import functions as F

master, n = sys.argv[1], int(sys.argv[2])
spark = get_spark("normprobe", master=master, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
rng = spark.range(n)
urls = rng.select(
    F.concat(
        F.lit("HTTP://WWW.SITE"), (F.col("id") % 512).cast("string"),
        F.lit(".EXAMPLE.COM:80/a/../cat/c"), (F.col("id") % 97).cast("string"),
        F.lit("/item"), (F.col("id") % 10007).cast("string"),
        F.lit(";jsessionid=S"), (F.col("id") % 997).cast("string"),
        F.lit("?ref=r"), (F.col("id") % 5).cast("string"),
        F.lit("&page="), (F.col("id") % 13).cast("string"),
    ).alias("url")
)
with_url_columns(urls.limit(50000)).count()  # warm workers + plans
t0 = time.time()
out = with_url_columns(urls).filter(F.col("url_canon").isNotNull()).count()
dt = time.time() - t0
print("LEGRESULT " + json.dumps(
    {"master": master, "n": n, "out": out, "sec": round(dt, 2),
     "urls_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_leg(master: str, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG, master, str(n)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg failed: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    legs: dict[str, list[dict]] = {"local[8]": [], "local[32]": []}
    for _ in range(reps):
        for master in ("local[8]", "local[32]"):
            r = run_leg(master, n)
            legs[master].append(r)
            print(r, file=sys.stderr)
    best = {m: max(rs, key=lambda r: r["urls_per_sec"]) for m, rs in legs.items()}
    speedup = best["local[32]"]["urls_per_sec"] / best["local[8]"]["urls_per_sec"]
    out = {
        "n_urls": n, "reps": reps, "legs": legs, "best": best,
        "speedup_8_to_32": round(speedup, 3),
        "efficiency_vs_4x": round(speedup / 4.0, 3),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "normalize_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best": best, "speedup_8_to_32": out["speedup_8_to_32"]}))


if __name__ == "__main__":
    main()
