"""Long-crawl soak: many iterations with compaction + history pruning.

Evidence for the r4 retention claim: over N iterations with
``compact_every=K, prune_history=True`` the checkpoint root must hold O(1)
snapshot tables per state kind (not O(N)), per-iteration wall time must
stay flat (the §21 incremental-state property, now WITH pruning in the
loop), and the final seen set must equal the unpruned run's count.

Usage: python tools/longcrawl_probe.py [iterations] [compact_every]
       -> BENCH/longcrawl.json
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
    compact_seen,
    init_state,
    prune_checkpoint_history,
    read_seen,
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


def main() -> None:
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("longcrawl", master="local[32]", shuffle_partitions=32)
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
    root = tempfile.mkdtemp(prefix="longcrawl_")
    cat = Catalog(spark, root)
    init_state(spark, seeds, robots, cat, "soak", pol, bloom_m_bits=BLOOM_M)
    iters = []
    for it in range(1, iterations + 1):
        t0 = time.time()
        n = run_iteration(spark, docs_idx, robots, cat, "soak", it, N_DOCS,
                          bloom_m_bits=BLOOM_M, pol=pol)
        if it % compact_every == 0:
            compact_seen(cat, it)
            prune_checkpoint_history(cat, it)
        dt = time.time() - t0
        snaps = [t for t in cat.table_names()
                 if t.startswith(("bloom_", "pending_", "host_state_",
                                  "scheduled_"))]
        iters.append({"iteration": it, "scheduled": n, "sec": round(dt, 2),
                      "snapshot_tables": len(snaps)})
        print(f"iter {it}: {n} scheduled, {dt:.2f}s, "
              f"{len(snaps)} snapshot tables", file=sys.stderr)
    seen_n = read_seen(cat, iterations).count()
    snaps = [t for t in cat.table_names()
             if t.startswith(("bloom_", "pending_", "host_state_",
                              "scheduled_"))]
    shutil.rmtree(root, ignore_errors=True)
    secs = sorted(i["sec"] for i in iters)
    mid = secs[len(secs) // 2]
    out = {
        "config": {"n_docs": N_DOCS, "n_hosts": N_HOSTS,
                   "seeds": N_HOSTS * SEEDS_PER_HOST, "budget": BUDGET,
                   "iterations": iterations, "compact_every": compact_every},
        "iterations": iters,
        "final_seen": seen_n,
        "final_snapshot_tables": sorted(snaps),
        "max_snapshot_tables": max(i["snapshot_tables"] for i in iters),
        "last_over_median": round(iters[-1]["sec"] / mid, 3),
        "flat": iters[-1]["sec"] <= 1.5 * mid,
        "bounded": max(i["snapshot_tables"] for i in iters)
        <= 3 + 4 * compact_every,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "longcrawl.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("final_seen", "max_snapshot_tables",
                       "last_over_median", "flat", "bounded")}))
    spark.stop()


if __name__ == "__main__":
    main()
