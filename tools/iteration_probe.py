"""Per-iteration wall-time flatness probe (VERDICT r1 fix #1 done-criterion).

The r1 crawl loop rewrote the FULL `seen` snapshot every iteration, so
per-iteration cost grew linearly with crawl age (quadratic cumulative I/O).
The r2 design appends only the iteration's delta and OR-merges fixed-size
Bloom bitmaps, so per-iteration wall time must stay FLAT while the seen set
grows. This probe runs >= 6 iterations at a steady per-iteration batch size
(budget-bounded scheduling keeps the scheduled count constant) and records
each iteration's wall time + the cumulative seen size.

Usage: python tools/iteration_probe.py [iterations] [master] [out_name]
       -> BENCH/<out_name; default iteration_times.json>

With a master argument this doubles as the STEADY-STATE scaling probe: the
mean of iterations 3..N at local[8] vs local[32] compares the warm loop
(the regime a long crawl lives in), excluding init and worker warm-up that
dominate the 2-iteration cold probe (tools/scaling_probe.py).
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
    read_seen,
    run_iteration,
)
from url_pattern_algorithm_spark.session import get_spark  # noqa: E402
from url_pattern_algorithm_spark.sources.catalog import Catalog  # noqa: E402
from url_pattern_algorithm_spark.sources.synthetic import (  # noqa: E402
    docs_df,
    robots_df,
)

# overridable via env: the default (32k scheduled/iter) probes FLATNESS;
# the scaling comparison needs the compute-dominated big-batch regime
# (SPARK_GRAFT_PROBE_BUDGET=4096 -> 262k scheduled/iter), because per-iter
# fixed stage latency does not scale with cores and at small batches it
# dominates the 8-vs-32 ratio
N_DOCS = int(os.environ.get("SPARK_GRAFT_PROBE_DOCS", "100000"))
N_HOSTS = int(os.environ.get("SPARK_GRAFT_PROBE_HOSTS", "64"))
SEEDS_PER_HOST = int(os.environ.get("SPARK_GRAFT_PROBE_SEEDS", "3000"))
BUDGET = float(os.environ.get("SPARK_GRAFT_PROBE_BUDGET", "512"))
BLOOM_M = 1 << 20


def main() -> None:
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
    out_name = sys.argv[3] if len(sys.argv) > 3 else "iteration_times.json"
    spark = get_spark("iterprobe", master=master, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = docs_df(spark, N_DOCS, N_HOSTS).persist()
    docs.count()
    from pyspark.sql import functions as F

    docs_idx = docs.withColumn(
        "doc_index", F.col("doc_id").substr(F.lit(4), F.lit(10)).cast("long")
    )
    seeds = bench_seeds(spark, N_HOSTS, SEEDS_PER_HOST)
    robots = robots_df(spark, N_HOSTS)
    pol = Politeness(BUDGET, BUDGET, BUDGET)
    root = tempfile.mkdtemp(prefix="iterprobe_")
    cat = Catalog(spark, root)
    init_state(spark, seeds, robots, cat, "probe", pol,
               bloom_m_bits=BLOOM_M)
    iters = []
    for it in range(1, iterations + 1):
        t0 = time.time()
        n = run_iteration(spark, docs_idx, robots, cat, "probe", it, N_DOCS,
                          bloom_m_bits=BLOOM_M, pol=pol)
        dt = time.time() - t0
        seen_n = read_seen(cat, it).count()
        iters.append({"iteration": it, "scheduled": n,
                      "sec": round(dt, 2), "seen_total": seen_n})
        print(f"iter {it}: {n} scheduled, {dt:.2f}s, seen={seen_n}",
              file=sys.stderr)
    shutil.rmtree(root, ignore_errors=True)
    first, last = iters[0]["sec"], iters[-1]["sec"]
    mid = sorted(i["sec"] for i in iters)[len(iters) // 2]
    warm = [i for i in iters if i["iteration"] >= 3]
    steady = sum(i["sec"] for i in warm) / max(len(warm), 1)
    out = {
        "config": {"n_docs": N_DOCS, "n_hosts": N_HOSTS,
                   "seeds": N_HOSTS * SEEDS_PER_HOST, "budget": BUDGET,
                   "bloom_m_bits": BLOOM_M, "master": master},
        "iterations": iters,
        "steady_state_sec_per_iter": round(steady, 2),
        "steady_state_urls_per_sec": round(
            sum(i["scheduled"] for i in warm)
            / max(sum(i["sec"] for i in warm), 1e-9), 1),
        "last_over_median": round(last / mid, 3),
        "flat": last <= 1.5 * mid,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", out_name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
