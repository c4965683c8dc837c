"""End-to-end crawl A/B: prefilter_kind='bloom' vs 'cuckoo' through run_crawl.

tools/cuckoo_probe.py isolates the data-structure trade (build/probe wall,
bytes, fp rate); this probe measures what a USER of the crawl loop sees —
full-iteration wall with every other stage (links UDF, normalize, robots,
politeness, salted top-k, four state writes) identical, the ONLY moving part
being the seen-prefilter kind. Legs run INTERLEAVED (B C B C ...) in one
session so machine drift lands on both sides, same protocol as
tools/reps_ab_probe.py (BENCH/BASELINE.md section 15/25).

Also asserts the semantic contract on every rep: per-iteration scheduled
counts identical across kinds (the prefilter is exact-safe either way).

Usage: python tools/cuckoo_crawl_ab.py [reps] [iterations]
  -> BENCH/cuckoo_crawl_ab.json
Bench-sized corpus via the same env knobs as bench.py
(SPARK_GRAFT_BENCH_DOCS/HOSTS/SEEDS/BUDGET).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from url_pattern_algorithm_spark.plans.crawl import Politeness, run_crawl
from url_pattern_algorithm_spark.session import get_spark
from url_pattern_algorithm_spark.sources.synthetic import docs_df, robots_df


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("cuckoocrawlab")
    spark.sparkContext.setLogLevel("ERROR")

    from bench import bench_seeds  # same corpus/config as the headline bench

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    n_hosts = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "64"))
    per_host = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "1500"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1024"))
    docs = docs_df(spark, n_docs, n_hosts).persist()
    docs.count()
    seeds = bench_seeds(spark, n_hosts, per_host)
    robots = robots_df(spark, n_hosts)
    pol = Politeness(tokens_init=budget, tokens_cap=budget, refill=budget)

    def leg(kind: str) -> tuple[float, dict[int, int]]:
        root = tempfile.mkdtemp(prefix=f"ab_{kind}_")
        t0 = time.time()
        counts = run_crawl(
            spark, docs, seeds, robots, root, n_docs=n_docs,
            iterations=iterations, run_id=f"ab_{kind}", pol=pol,
            bloom_m_bits=1 << 20, compact_every=2, prefilter_kind=kind,
        )
        dt = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return dt, counts

    walls: dict[str, list[float]] = {"bloom": [], "cuckoo": []}
    counts_seen: dict[str, dict[int, int]] = {}
    for rep in range(reps):
        for kind in ("bloom", "cuckoo"):
            dt, counts = leg(kind)
            walls[kind].append(round(dt, 3))
            prev = counts_seen.setdefault(kind, counts)
            assert counts == prev, (kind, counts, prev)
            print(f"rep {rep} {kind}: {dt:.2f}s scheduled={sum(counts.values())}")
    assert counts_seen["bloom"] == counts_seen["cuckoo"], counts_seen

    scheduled = sum(counts_seen["bloom"].values())
    best = {k: min(v) for k, v in walls.items()}
    out = {
        "n_docs": n_docs, "n_hosts": n_hosts, "iterations": iterations,
        "reps": reps, "scheduled_urls": scheduled,
        "wall_s": walls, "best_s": best,
        "urls_per_sec": {k: round(scheduled / v, 1) for k, v in best.items()},
        "ratio_cuckoo_over_bloom": round(best["cuckoo"] / best["bloom"], 3),
        "counts_identical": True,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cuckoo_crawl_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    docs.unpersist()


if __name__ == "__main__":
    main()
