"""Two-parallelism scaling probe (sandbox proxy for N vs 4N executors).

Runs the full crawl loop (normalize -> robots -> Bloom+anti-join seen ->
politeness -> salted top-k -> checkpoint write) at local[8] and local[32]
on identical input, interleaved A/B/A/B with several repetitions, and
reports per-leg MINIMUM wall time (the noise-robust estimator on a shared
machine). Writes BENCH/scaling.json (summarized in BENCH/BASELINE.md).

Usage: python tools/scaling_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

LEG_SCRIPT = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, ".")
from url_pattern_algorithm_spark.session import get_spark
from url_pattern_algorithm_spark.plans.crawl import Politeness, run_crawl
from url_pattern_algorithm_spark.sources.synthetic import docs_df, robots_df
from bench import bench_seeds

master = sys.argv[1]
spark = get_spark("scale-leg", master=master, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
N_DOCS, N_HOSTS, SEEDS, BUDGET = 200000, 64, 10000, 8192.0
docs = docs_df(spark, N_DOCS, N_HOSTS).persist(); docs.count()
seeds = bench_seeds(spark, N_HOSTS, SEEDS)
robots = robots_df(spark, N_HOSTS)
pol = Politeness(BUDGET, BUDGET, BUDGET)
root = tempfile.mkdtemp(prefix="scale_")
t0 = time.time()
counts = run_crawl(spark, docs, seeds, robots, root, n_docs=N_DOCS,
                   iterations=2, run_id="scale", pol=pol,
                   bloom_m_bits=1 << 20)
dt = time.time() - t0
shutil.rmtree(root, ignore_errors=True)
print("LEGRESULT " + json.dumps(
    {"master": master, "scheduled": sum(counts.values()), "sec": round(dt, 2)}))
spark.stop()
"""


def run_leg(master: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG_SCRIPT, master],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg failed: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, list[dict]] = {"local[8]": [], "local[32]": []}
    for r in range(reps):
        for master in ("local[8]", "local[32]"):
            leg = run_leg(master)
            results[master].append(leg)
            print(f"rep {r} {master}: {leg['sec']}s "
                  f"({leg['scheduled'] / leg['sec']:.0f} urls/s)", flush=True)
    best = {
        m: min(legs, key=lambda x: x["sec"]) for m, legs in results.items()
    }
    ups8 = best["local[8]"]["scheduled"] / best["local[8]"]["sec"]
    ups32 = best["local[32]"]["scheduled"] / best["local[32]"]["sec"]
    eff = ups32 / ups8 / 4.0
    summary = {
        "local8_best_sec": best["local[8]"]["sec"],
        "local32_best_sec": best["local[32]"]["sec"],
        "local8_urls_per_sec": round(ups8, 1),
        "local32_urls_per_sec": round(ups32, 1),
        "speedup_8_to_32": round(ups32 / ups8, 3),
        "efficiency_vs_4x": round(eff, 3),
        "all_runs": results,
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
