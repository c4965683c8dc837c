"""The frontier crawl loop: iterative batch over checkpoint tables (north_rule).

One iteration (all DataFrame ops, nothing frontier-scale on the driver):

    pending ⋈ politeness budgets -> salted priority top-k  = scheduled batch
    scheduled -> deterministic fetch (url_hash -> doc)     = fetched docs
    docs -> extract_links -> normalize -> robots filter
         -> Bloom + anti-join seen filter                  = new frontier rows
    state' = (pending - scheduled + new, seen + new, token buckets debited)

State tables are snapshot per iteration through the Catalog (Iceberg-shaped;
parquet here) with lineage stamps, so a run can resume from ANY iteration
(``resume``) and reproduce the uninterrupted run exactly — the F6 parity
property. At 10^10-URL scale the `seen` snapshot-per-iteration becomes an
append-only bucket-partitioned table + periodic compaction; the interface
here already isolates that policy inside Catalog.

The 'web' is simulated deterministically: fetching a URL returns the synthetic
doc with index splitmix(url_hash) — same function in the pure-python oracle
(kernel/crawl_oracle.py), which this pipeline must match row-for-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.functions.links import extract_normalize_udf
from url_pattern_algorithm_spark.functions.udfs import with_url_columns
from url_pattern_algorithm_spark.operators.frontier import (
    build_bloom,
    politeness_budgets,
    robots_filter,
    schedule_top_k,
    seen_filter,
)
from url_pattern_algorithm_spark.sources.catalog import Catalog
from url_pattern_algorithm_spark.sources.synthetic import _mix

TOKENS_INIT = 2.0
TOKENS_CAP = 4.0
REFILL = 1.0


class Politeness:
    """Per-host token-bucket parameters (defaults = parity-test values;
    benches raise them to schedule large batches per iteration)."""

    def __init__(self, tokens_init: float = TOKENS_INIT,
                 tokens_cap: float = TOKENS_CAP, refill: float = REFILL):
        self.tokens_init = tokens_init
        self.tokens_cap = tokens_cap
        self.refill = refill


DEFAULT_POLITENESS = Politeness()

PENDING_COLS = ["url", "url_canon", "url_hash", "host", "priority", "discovered_iter"]


def fetch_doc_index_udf(n_docs: int):
    """url_hash -> deterministic synthetic doc index (the simulated web)."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda h: _mix(13, int(h) & ((1 << 64) - 1)) % n_docs)

    return F.pandas_udf(fn, "long")


def _new_frontier_rows(
    spark: SparkSession,
    raw_candidates: DataFrame,
    robots: DataFrame,
    seen: DataFrame | None,
    blooms: DataFrame | None,
    discovered_iter: int,
    bloom_buckets: int = 64,
) -> DataFrame:
    """candidates -> normalized, robots-filtered, unseen, deduped rows.

    Accepts either raw (url) rows or pre-normalized (url, url_canon, host)
    rows from the fused extract+normalize UDF (one Arrow pass on the hot
    path)."""
    if "url_canon" not in raw_candidates.columns:
        cand = with_url_columns(raw_candidates)
    else:
        cand = raw_candidates.withColumn("url_hash", F.xxhash64("url_canon"))
    cand = cand.filter(F.col("url_canon").isNotNull())
    cand = robots_filter(cand, robots)
    cand = seen_filter(cand, seen, blooms, bloom_buckets)
    # batch-internal dedup on the canonical hash; deterministic representative
    dedup = cand.groupBy("url_hash").agg(
        F.min("url").alias("url"),
        F.min("url_canon").alias("url_canon"),
        F.min("host").alias("host"),
    )
    return dedup.select(
        "url",
        "url_canon",
        "url_hash",
        "host",
        F.lit(1.0 / (discovered_iter + 1.0)).alias("priority"),
        F.lit(discovered_iter).alias("discovered_iter"),
    )


def init_state(
    spark: SparkSession,
    seeds: DataFrame,
    robots: DataFrame,
    cat: Catalog,
    run_id: str,
    pol: Politeness = DEFAULT_POLITENESS,
) -> None:
    """Iteration 0: seed list -> pending/seen/host_state snapshots."""
    cand = with_url_columns(seeds).filter(F.col("url_canon").isNotNull())
    cand = robots_filter(cand, robots)
    pending = cand.groupBy("url_hash").agg(
        F.min("url").alias("url"),
        F.min("url_canon").alias("url_canon"),
        F.min("host").alias("host"),
        F.max("priority").alias("priority"),
    ).select(*PENDING_COLS[:5], F.lit(0).alias("discovered_iter"))
    # one UDF pass: pending feeds three checkpoint writes
    pending = pending.persist()
    cat.write_checkpoint(pending, "pending_0", run_id, 0)
    seen = pending.select("url_hash", "url_canon", F.lit(0).alias("first_iter"))
    cat.write_checkpoint(seen, "seen_0", run_id, 0)
    host_state = pending.select("host").distinct().select(
        "host",
        F.lit(pol.tokens_init).alias("tokens"),
        F.lit(0).alias("last_iter"),
        F.lit(1.0).alias("crawl_delay"),
    )
    cat.write_checkpoint(host_state, "host_state_0", run_id, 0)
    cat.flush_metrics()
    pending.unpersist()


def run_iteration(
    spark: SparkSession,
    docs: DataFrame,
    robots: DataFrame,
    cat: Catalog,
    run_id: str,
    iteration: int,
    n_docs: int,
    salts: int = 16,
    use_bloom: bool = True,
    bloom_buckets: int = 64,
    pol: Politeness = DEFAULT_POLITENESS,
) -> int:
    """Advance one iteration from snapshot ``iteration-1``; returns the
    number of scheduled URLs."""
    prev = iteration - 1
    pending = cat.read(f"pending_{prev}").select(*PENDING_COLS)
    seen = cat.read(f"seen_{prev}").select("url_hash", "url_canon", "first_iter")
    host_state = cat.read(f"host_state_{prev}").select(
        "host", "tokens", "last_iter", "crawl_delay"
    )

    # 1. politeness budgets + salted priority top-k
    budgets = politeness_budgets(host_state, pol.refill, pol.tokens_cap)
    frontier = pending.join(F.broadcast(budgets), "host", "inner")
    scheduled = schedule_top_k(frontier, F.col("budget"), salts=salts)
    scheduled = scheduled.persist()
    n_scheduled = cat.write_checkpoint(
        scheduled.select(*PENDING_COLS, "sched_rank"),
        f"scheduled_{iteration}",
        run_id,
        iteration,
    )

    # 2. debit token buckets; unknown hosts keep state
    spent = scheduled.groupBy("host").agg(F.count("*").alias("n_sched"))
    new_host_state = (
        budgets.join(spent, "host", "left")
        .na.fill({"n_sched": 0})
        .select(
            "host",
            (F.col("tokens_avail") - F.col("n_sched")).alias("tokens"),
            F.lit(iteration).alias("last_iter"),
        )
        .join(host_state.select("host", "crawl_delay"), "host", "inner")
    )

    # 3. fetch + extract + normalize + filter
    fetched = scheduled.withColumn(
        "doc_index", fetch_doc_index_udf(n_docs)(F.col("url_hash"))
    )
    # docs must carry a deterministic doc_index (run_crawl derives it from
    # doc_id); never monotonically_increasing_id — that's partition-dependent
    pages = fetched.join(docs, "doc_index", "inner")
    raw_candidates = pages.select(
        F.explode(extract_normalize_udf(F.col("spans"))).alias("l")
    ).select("l.url", "l.url_canon", "l.host")
    blooms = build_bloom(seen, bloom_buckets) if use_bloom else None
    new_rows = _new_frontier_rows(
        spark, raw_candidates, robots, seen, blooms, iteration, bloom_buckets
    )
    # the candidate pipeline (links UDF -> normalize UDF -> robots -> seen
    # filter -> dedup shuffle) feeds pending_N, seen_N and host_state_N:
    # persist so it runs once, not three times
    new_rows = new_rows.persist()

    # 4. next snapshots
    remaining = pending.join(
        scheduled.select("url_hash"), "url_hash", "left_anti"
    ).select(*PENDING_COLS)
    next_pending = remaining.unionByName(new_rows.select(*PENDING_COLS))
    cat.write_checkpoint(next_pending, f"pending_{iteration}", run_id, iteration)
    next_seen = seen.unionByName(
        new_rows.select(
            "url_hash", "url_canon", F.lit(iteration).alias("first_iter")
        )
    )
    cat.write_checkpoint(next_seen, f"seen_{iteration}", run_id, iteration)
    new_hosts = (
        new_rows.select("host").distinct()
        .join(new_host_state.select("host"), "host", "left_anti")
        .select(
            "host",
            F.lit(pol.tokens_init).alias("tokens"),
            F.lit(iteration).alias("last_iter"),
            F.lit(1.0).alias("crawl_delay"),
        )
    )
    cat.write_checkpoint(
        new_host_state.select("host", "tokens", "last_iter", "crawl_delay")
        .unionByName(new_hosts),
        f"host_state_{iteration}",
        run_id,
        iteration,
    )
    cat.flush_metrics()
    new_rows.unpersist()
    scheduled.unpersist()
    return n_scheduled


def run_crawl(
    spark: SparkSession,
    docs: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    ckpt_root: str,
    n_docs: int,
    iterations: int = 3,
    run_id: str = "run1",
    resume_from: int | None = None,
    salts: int = 16,
    use_bloom: bool = True,
    pol: Politeness = DEFAULT_POLITENESS,
) -> dict[int, int]:
    """Run (or resume) the crawl; returns {iteration: n_scheduled}.

    ``resume_from=k`` skips init and iterations <= k, reading snapshot k —
    byte-identical continuation (F6 resume test).
    """
    cat = Catalog(spark, ckpt_root)
    if "doc_index" not in docs.columns:
        docs = docs.withColumn(
            "doc_index",
            F.col("doc_id").substr(F.lit(4), F.lit(10)).cast("long"),
        )
    counts: dict[int, int] = {}
    start = 1
    if resume_from is None:
        init_state(spark, seeds, robots, cat, run_id, pol)
    else:
        start = resume_from + 1
    for it in range(start, iterations + 1):
        counts[it] = run_iteration(
            spark, docs, robots, cat, run_id, it, n_docs, salts, use_bloom,
            pol=pol,
        )
    return counts
