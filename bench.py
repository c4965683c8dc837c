"""Benchmark harness: headline queries + a frontier crawl iteration loop.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

The headline metric is frontier URLs scheduled per second over the full
normalize -> seen-filter -> politeness -> priority -> checkpoint pipeline
(BASELINE.json target). Set ``SPARK_GRAFT_SCALING=1`` to also run a quick
two-parallelism probe (local[8] vs local[32]) — NB its legs are
SEQUENTIAL, so on this co-tenant box the number is advisory only; the
authoritative scaling evidence is the interleaved probes
(tools/scaling_probe.py, tools/iteration_probe.py) read against same-day
ceilings (tools/ceiling_probe.py, tools/shuffle_probe.py) — see
BENCH/BASELINE.md §15-17. The ``ab_interleaved`` section at the end IS
same-session and is the valid cross-round per-query comparison.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline per-query benches (subset of the registry: the heavy hitters that
# exercise the UDF boundary, shuffles, windows and applyInPandas)
BENCH_QUERIES = [
    "url_normalize",
    "frontier_schedule",
    "crawl_skew_schedule",
    "url_seen_antijoin",
    "kv_entropy",
    "pattern_tree_nodes",
    "theme_page_classify",
    "rewrite_compression",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_multiprobe",
    "ann_ivf",
    "garbage_page_report",
    "doc_quality",
]


def _spark(master: str):
    from url_pattern_algorithm_spark.session import get_spark

    s = get_spark(
        "bench", master=master,
        shuffle_partitions=max(int(master.split("[")[1].rstrip("]")), 8)
        if "[" in master and master.split("[")[1].rstrip("]").isdigit()
        else 32,
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from url_pattern_algorithm_spark.queries import (
        QUERIES,
        q_rewrite_compression,
        release_persisted,
    )

    # the correctness-facing EP1 corpus is scale-pinned (its learned rules
    # are a closed-form SQL oracle); the BENCH keeps the learn workload
    # growing with sf by scaling the corpus amplification to the table size
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    def rewrite_compression_scaled(s, d):
        release_persisted()
        return q_rewrite_compression(s, d, amp=max(10, n_orders // 1500))

    from url_pattern_algorithm_spark import queries as qmod

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = (rewrite_compression_scaled if name == "rewrite_compression"
              else QUERIES.get(name) or _bench_fallback(qmod, name))
        if fn is None:
            raise KeyError(
                f"bench query {name!r}: not in the driver registry and no "
                f"q_{name} in queries.py — fix BENCH_QUERIES"
            )
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0
    release_persisted()
    return timings


def bench_seeds(spark, n_hosts: int, per_host: int):
    """Large deterministic seed list, generated JVM-side (spark.range)."""
    from pyspark.sql import functions as F

    rng = spark.range(n_hosts * per_host)
    h = (F.col("id") % n_hosts).cast("string")
    return rng.select(
        F.concat(
            F.lit("http://site"), h, F.lit(".example.com/cat/news/"),
            (F.col("id") / n_hosts).cast("long").cast("string"),
        ).alias("url"),
        (1.0 + F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 1000.0).alias(
            "priority"
        ),
    )


def run_crawl_bench(spark, sf_dir: str, iterations: int = 3):
    """The headline: synthetic interleaved-docs crawl, URLs scheduled/sec
    through the full normalize -> robots -> seen -> politeness -> top-k ->
    checkpoint pipeline, with budgets sized for batch scheduling."""
    from url_pattern_algorithm_spark.plans.crawl import Politeness, run_crawl
    from url_pattern_algorithm_spark.sources.synthetic import docs_df, robots_df

    # compute-dominated config (r2): batch sizes where per-core work beats
    # the ~15-stage/iteration fixed latency, so r-over-r comparisons track
    # engine changes, not driver overhead; compaction + the fixed-m
    # incremental Bloom path run exactly as a long crawl would use them
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    n_hosts = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "64"))
    per_host = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "1500"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1024"))
    docs = docs_df(spark, n_docs, n_hosts).persist()
    docs.count()
    seeds = bench_seeds(spark, n_hosts, per_host)
    robots = robots_df(spark, n_hosts)
    pol = Politeness(tokens_init=budget, tokens_cap=budget, refill=budget)
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    t0 = time.time()
    counts = run_crawl(
        spark, docs, seeds, robots, root, n_docs=n_docs,
        iterations=iterations, run_id="bench", pol=pol,
        bloom_m_bits=1 << 20, compact_every=2,
    )
    dt = time.time() - t0
    docs.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    scheduled = sum(counts.values())
    return scheduled, dt


def _bench_fallback(qmod, name):
    """Resolve a bench-only query absent from the driver registry (e.g.
    pattern_tree_nodes after the r5 sweep-window consolidation) to the
    module's raw q_* function, wrapped with the registry's release-before-
    run behavior. One definition serves run_queries AND the A/B leg loader
    so head/ref timings can't diverge on wrapping."""
    raw = getattr(qmod, f"q_{name}", None)
    if raw is None:
        return None

    def run(s, d):
        qmod.release_persisted()
        return raw(s, d)

    return run


_BY_VALUE_MODULES: list = []


def _load_queries(pkg_root: str):
    """(Re)import the package's query registry from ``pkg_root``, purging
    any previously-imported version — the interleaved A/B swaps code
    versions inside ONE SparkSession (this box's co-tenant noise is up to
    2x run-to-run, so only same-session interleaved comparisons are
    meaningful; cross-day raw numbers are not).

    Every package module is registered for cloudpickle BY-VALUE
    serialization: Python workers resolve by-reference pickles through
    their own PYTHONPATH (always HEAD), so without this a ref leg would
    run ref driver plans over HEAD UDF kernels — a chimera that hides
    worker-side kernel changes from the A/B."""
    import importlib

    from pyspark import cloudpickle

    global _BY_VALUE_MODULES
    for m in _BY_VALUE_MODULES:
        try:
            cloudpickle.unregister_pickle_by_value(m)
        except Exception:
            pass
    _BY_VALUE_MODULES = []
    for name in [k for k in sys.modules
                 if k.startswith("url_pattern_algorithm_spark")]:
        del sys.modules[name]
    sys.path.insert(0, pkg_root)
    try:
        importlib.invalidate_caches()
        qmod = importlib.import_module("url_pattern_algorithm_spark.queries")
        # registry entries first; bench-only names resolve via the shared
        # fallback so head/ref legs wrap identically
        queries = dict(qmod.QUERIES)
        for name in BENCH_QUERIES:
            if name not in queries:
                fb = _bench_fallback(qmod, name)
                if fb is not None:
                    queries[name] = fb
        for name, mod in list(sys.modules.items()):
            if name.startswith("url_pattern_algorithm_spark") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
                _BY_VALUE_MODULES.append(mod)
        return queries
    finally:
        sys.path.remove(pkg_root)


def run_ab_queries(spark, sf_dir: str, ref: str, reps: int = 2,
                   queries: list[str] | None = None) -> dict:
    """Interleaved same-session A/B: HEAD vs a prior git ref (default tag
    r3), alternating legs per rep, best-of-reps per leg. Returns
    {query: {head, ref, ratio}} (ratio < 1 = HEAD faster)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(
        f"git -C {repo} archive --format=tar {ref} "
        f"url_pattern_algorithm_spark | tar -x -C {tmp}",
        shell=True, check=True,
    )
    names = queries or BENCH_QUERIES
    best: dict[str, dict[str, float]] = {
        n: {"head": float("inf"), "ref": float("inf")} for n in names
    }
    try:
        for _ in range(reps):
            for leg, root in (("head", repo), ("ref", tmp)):
                q = _load_queries(root)
                for name in names:
                    if name not in q:
                        continue
                    t0 = time.time()
                    q[name](spark, sf_dir).count()
                    best[name][leg] = min(best[name][leg],
                                          round(time.time() - t0, 3))
                spark.catalog.clearCache()  # r2 legs pre-date the tracked
                # persist registry; don't let their caches leak across legs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        _load_queries(repo)  # leave HEAD imported for later callers
        # ... but drop the by-value registration: outside the A/B, workers
        # resolving HEAD through their PYTHONPATH is correct and cheaper
        from pyspark import cloudpickle

        global _BY_VALUE_MODULES
        for m in _BY_VALUE_MODULES:
            try:
                cloudpickle.unregister_pickle_by_value(m)
            except Exception:
                pass
        _BY_VALUE_MODULES = []
    out = {}
    for name, legs in best.items():
        if legs["ref"] == float("inf") or legs["head"] == float("inf"):
            continue
        out[name] = dict(legs, ratio=round(legs["head"] / legs["ref"], 3))
    return out


def bench_once(master: str, sf_dir: str):
    spark = _spark(master)
    try:
        # best-of-reps: a single crawl leg can land in a co-tenant noise
        # window (this box drifts up to 2x on ~10-min scales); the best of
        # two same-session reps is the noise-robust headline estimator
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
        runs = [run_crawl_bench(spark, sf_dir) for _ in range(max(reps, 1))]
        scheduled, crawl_s = min(runs, key=lambda r: r[1] / max(r[0], 1))
        qt = run_queries(spark, sf_dir)
        return {
            "scheduled": scheduled,
            "crawl_sec": round(crawl_s, 3),
            "crawl_sec_reps": [round(s, 3) for _, s in runs],
            "urls_per_sec": round(scheduled / crawl_s, 1),
            "queries": qt,
        }
    finally:
        spark.stop()


def main() -> None:
    res = bench_once(f"local[{CPUS}]", SF_DIR)
    out = {
        "metric": "frontier URLs scheduled/sec (crawl loop) + headline query secs",
        "value": round(res["crawl_sec"] + sum(res["queries"].values()), 3),
        "unit": "sec",
        "queries": dict(
            res["queries"],
            crawl_loop=res["crawl_sec"],
        ),
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "urls_per_sec": res["urls_per_sec"],
        "scheduled_urls": res["scheduled"],
        "crawl_sec_reps": res.get("crawl_sec_reps"),
        "cpus": CPUS,
    }
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        lo = bench_once("local[8]", SF_DIR)
        out["scaling"] = {
            "local8_urls_per_sec": lo["urls_per_sec"],
            "local32_urls_per_sec": res["urls_per_sec"],
            "efficiency": round(res["urls_per_sec"] / lo["urls_per_sec"] / 4.0, 3),
        }
    # interleaved cross-round A/B (r2 verdict item 8): this box's 2x
    # co-tenant noise makes cross-day per-query numbers uninterpretable, so
    # compare HEAD against the previous round's tag inside one session.
    # Default ref: tag r4; SPARK_GRAFT_AB_REF overrides, =skip disables.
    ab_ref = os.environ.get("SPARK_GRAFT_AB_REF", "r4")
    if ab_ref != "skip":
        try:
            spark = _spark(f"local[{CPUS}]")
            try:
                # rewrite_compression is excluded: its corpus was
                # deliberately re-derived in r3 (scale-pinned closed form),
                # so the legs would time different workloads
                out["ab_interleaved"] = {
                    "ref": ab_ref,
                    "queries": run_ab_queries(
                        spark, SF_DIR, ab_ref,
                        queries=[n for n in BENCH_QUERIES
                                 if n != "rewrite_compression"],
                    ),
                }
            finally:
                spark.stop()
        except Exception as e:  # a missing tag must not sink the bench
            out["ab_interleaved"] = {"ref": ab_ref, "error": str(e)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
