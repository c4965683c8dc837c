"""Same-session interleaved A/B: sequential vs concurrent state writes.

The crawl iteration's three trailing state writes (pending/host_state/bloom)
are mutually independent; _run_writers submits them as concurrent driver
jobs by default. Cross-session numbers on this box carry up-to-2x co-tenant
noise, so this probe decides keep-or-revert the honest way: one Python
process, one SparkSession, alternating seq/conc legs (each leg = fresh
checkpoint root, init + N iterations), compare per-mode BEST-leg warm mean.

The toggle (SPARK_GRAFT_SEQ_WRITES) only changes driver-side threading —
worker-side code is identical in both legs, so no pickle-by-value games are
needed (unlike bench.py's cross-ref A/B).

Usage: python tools/writes_ab_probe.py [legs_per_mode] [iters_per_leg]
       -> BENCH/writes_ab.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_seeds  # noqa: E402
from url_pattern_algorithm_spark.plans.crawl import (  # noqa: E402
    Politeness,
    init_state,
    run_iteration,
)
from url_pattern_algorithm_spark.session import get_spark  # noqa: E402
from url_pattern_algorithm_spark.sources.catalog import Catalog  # noqa: E402
from url_pattern_algorithm_spark.sources.synthetic import (  # noqa: E402
    docs_df,
    robots_df,
)

N_DOCS = 100_000
N_HOSTS = 64
SEEDS_PER_HOST = 3000
BUDGET = 512.0
BLOOM_M = 1 << 20


def run_leg(spark, docs_idx, seeds, robots, pol, iters: int) -> list[float]:
    root = tempfile.mkdtemp(prefix="writesab_")
    cat = Catalog(spark, root)
    try:
        init_state(spark, seeds, robots, cat, "ab", pol, bloom_m_bits=BLOOM_M)
        times = []
        for it in range(1, iters + 1):
            t0 = time.time()
            run_iteration(spark, docs_idx, robots, cat, "ab", it, N_DOCS,
                          bloom_m_bits=BLOOM_M, pol=pol)
            times.append(time.time() - t0)
        return times
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("writesab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    docs = docs_df(spark, N_DOCS, N_HOSTS).persist()
    docs.count()
    docs_idx = docs.withColumn(
        "doc_index", F.col("doc_id").substr(F.lit(4), F.lit(10)).cast("long")
    )
    seeds = bench_seeds(spark, N_HOSTS, SEEDS_PER_HOST)
    robots = robots_df(spark, N_HOSTS)
    pol = Politeness(BUDGET, BUDGET, BUDGET)

    # warm-up leg (JIT/codegen/shuffle services), not recorded
    os.environ["SPARK_GRAFT_SEQ_WRITES"] = "1"
    run_leg(spark, docs_idx, seeds, robots, pol, 2)

    results: dict[str, list[list[float]]] = {"seq": [], "conc": []}
    for _ in range(legs):
        for mode in ("seq", "conc"):
            os.environ["SPARK_GRAFT_SEQ_WRITES"] = "1" if mode == "seq" else "0"
            t = run_leg(spark, docs_idx, seeds, robots, pol, iters)
            results[mode].append([round(x, 2) for x in t])
            print(f"{mode}: {[round(x, 2) for x in t]}", file=sys.stderr)
    os.environ.pop("SPARK_GRAFT_SEQ_WRITES", None)

    def warm_mean(leg: list[float]) -> float:
        w = leg[1:] if len(leg) > 1 else leg
        return sum(w) / len(w)

    best = {m: round(min(warm_mean(leg) for leg in results[m]), 2)
            for m in results}
    out = {
        "config": {"n_docs": N_DOCS, "n_hosts": N_HOSTS,
                   "seeds": N_HOSTS * SEEDS_PER_HOST, "budget": BUDGET,
                   "legs_per_mode": legs, "iters_per_leg": iters,
                   "master": "local[32]"},
        "legs": results,
        "best_warm_mean_sec": best,
        "conc_over_seq": round(best["conc"] / best["seq"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "writes_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
