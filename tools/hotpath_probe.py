"""Hot-path scaling probe: the per-iteration candidate pipeline alone.

Measures the compute-bound inner job of a crawl iteration — candidate URL
normalization (pandas UDF chain), hashing, dedup shuffle, salted priority
top-k — over a JVM-generated candidate stream big enough that per-core work
dominates fixed pipeline latency. This is the sandbox stand-in for per-
executor throughput at cluster batch sizes: the full-loop probe
(tools/scaling_probe.py) reports end-to-end numbers including the local-mode
latency floor; this one isolates how the work itself scales with cores.

Usage: python tools/hotpath_probe.py [n_urls] [reps]
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
from url_pattern_algorithm_spark.operators.frontier import schedule_top_k
from pyspark.sql import functions as F

master, n = sys.argv[1], int(sys.argv[2])
spark = get_spark("hotpath", master=master, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

rng = spark.range(n)
h = (F.col("id") % 512).cast("string")
urls = rng.select(
    F.concat(
        F.lit("HTTP://WWW.SITE"), h, F.lit(".EXAMPLE.COM:80/cat/c"),
        (F.col("id") % 97).cast("string"), F.lit("/item"),
        (F.col("id") % 10007).cast("string"),
        F.lit("?ref=r"), (F.col("id") % 5).cast("string"),
        F.lit("&page="), (F.col("id") % 13).cast("string"),
        F.lit("&sid=s"), F.col("id").cast("string"),
    ).alias("url")
)
# warmup (compile plans, spawn workers) on a small slice
with_url_columns(urls.limit(50000)).count()

t0 = time.time()
cand = with_url_columns(urls).filter(F.col("url_canon").isNotNull())
ded = cand.groupBy("url_hash").agg(
    F.min("url").alias("url"), F.min("url_canon").alias("url_canon"),
    F.min("host").alias("host"),
).withColumn("priority", F.col("url_hash").cast("double"))
sched = schedule_top_k(ded.withColumn("budget", F.lit(1000)),
                       F.col("budget"), salts=16)
n_out = sched.count()
dt = time.time() - t0
print("LEGRESULT " + json.dumps(
    {"master": master, "n": n, "out": n_out, "sec": round(dt, 2),
     "urls_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_leg(master: str, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG, master, str(n)],
        capture_output=True, text=True, timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg failed: {out.stdout[-1500:]} {out.stderr[-1500:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: dict[str, list[dict]] = {"local[8]": [], "local[32]": []}
    for r in range(reps):
        for master in ("local[8]", "local[32]"):
            leg = run_leg(master, n)
            results[master].append(leg)
            print(f"rep {r} {master}: {leg['sec']}s "
                  f"({leg['urls_per_sec']:.0f} urls/s)", flush=True)
    best8 = max(x["urls_per_sec"] for x in results["local[8]"])
    best32 = max(x["urls_per_sec"] for x in results["local[32]"])
    summary = {
        "n_urls": n,
        "local8_urls_per_sec": best8,
        "local32_urls_per_sec": best32,
        "speedup_8_to_32": round(best32 / best8, 3),
        "efficiency_vs_4x": round(best32 / best8 / 4.0, 3),
        "all_runs": results,
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hotpath_scaling.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
