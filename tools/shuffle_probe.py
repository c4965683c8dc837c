"""Shuffle-stage ceiling probe: what does 8->32 threads buy a PURE shuffle
on this box? A single-JVM local-mode shuffle shares one memory bus and one
disk across all threads, so its 8->32 scaling caps well below the
compute ceiling (tools/ceiling_probe.py) — and the crawl loop, whose
iteration is roughly half shuffle (dedup/anti-join/top-k/checkpoint) and
half Arrow-UDF compute, lands between the two ceilings. On a multi-node
cluster each executor brings its own disks + memory bandwidth, so the
shuffle term scales with nodes by construction; this probe documents the
sandbox's cap, it does not transfer to the cluster.

Interleaved legs in fresh processes, per-leg best of reps.

Usage: python tools/shuffle_probe.py [n_rows] [reps] -> BENCH/shuffle_ceiling.json
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
from pyspark.sql import functions as F

master, n = sys.argv[1], int(sys.argv[2])
spark = get_spark("shufprobe", master=master, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(n).select(
    F.col("id"),
    F.xxhash64("id").alias("k"),
    F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
             F.lit(".com/p/"), F.col("id").cast("string")).alias("payload"),
)
t0 = time.time()
out = df.repartition(64, "k").groupBy(F.pmod("k", F.lit(10007))).agg(
    F.count("*"), F.max("payload")).count()
dt = time.time() - t0
print("LEGRESULT " + json.dumps(
    {"master": master, "n": n, "groups": out, "sec": round(dt, 2),
     "rows_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_leg(master: str, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG, master, str(n)],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg failed: {out.stdout[-1500:]} {out.stderr[-1500:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    out_name = sys.argv[5] if len(sys.argv) > 5 else "shuffle_ceiling.json"
    lo_m, hi_m = f"local[{lo}]", f"local[{hi}]"
    legs: dict[str, list[dict]] = {lo_m: [], hi_m: []}
    for _ in range(reps):
        for master in (lo_m, hi_m):
            r = run_leg(master, n)
            legs[master].append(r)
            print(f"{master}: {r['sec']}s ({r['rows_per_sec']} rows/s)")
    best = {m: max(v, key=lambda x: x["rows_per_sec"]) for m, v in legs.items()}
    speedup_key = f"speedup_{lo}_to_{hi}"
    out = {
        "n_rows": n, "reps": reps, "legs": legs, "best": best,
        speedup_key: round(
            best[hi_m]["rows_per_sec"] / best[lo_m]["rows_per_sec"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", out_name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (speedup_key,)}))


if __name__ == "__main__":
    main()
