"""Structured Streaming surface: incremental event rollups + a streaming
frontier-candidate feed.

The reference is all-batch MapReduce and the north_rule's crawl loop is
iterative batch over checkpoint tables (SURVEY.md §2.12) — streaming is NOT
needed for reference parity. This module exists for the continuous-ingest
deployments of the same pipeline: the identical DataFrame expressions run
incrementally under ``readStream`` with watermarked event-time windows, and
``Trigger.AvailableNow`` gives exactly-once batch-equivalent runs (verified
against the batch rollup in tests).

Scale notes: windowed aggregation state is keyed by (window, event_type) —
bounded keys, bounded state; the watermark expires state after
``late_threshold``. For the candidate feed, the normalize UDF chain is
stateless, so it parallelizes identically to the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.functions.udfs import with_url_columns

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files: int = 4) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_rollup(events: DataFrame, window: str = "1 hour",
                    late_threshold: str = "2 hours") -> DataFrame:
    """Watermarked per-type event-time window rollup — the incremental twin
    of queries.q_events_rollup (same aggregate expressions)."""
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type", "n", "sum_value",
        )
    )


def candidate_stream(urls: DataFrame) -> DataFrame:
    """Streaming frontier-candidate normalization: url -> (url, url_canon,
    url_hash, host). Stateless — the same with_url_columns chain as batch."""
    return with_url_columns(urls).filter(F.col("url_canon").isNotNull())


def dedup_candidate_stream(urls: DataFrame, ts_col: str = "ts",
                           late_threshold: str = "1 hour") -> DataFrame:
    """Watermark-bounded streaming dedup of frontier candidates — the
    incremental twin of the batch ``operators.frontier.filter_unseen``
    seen-anti-join (first occurrence of each ``url_hash`` wins).

    Batch keeps a persistent ``seen`` table and anti-joins every iteration;
    a continuous-ingest deployment can't grow state with crawl age, so this
    uses ``dropDuplicatesWithinWatermark`` on the canonical hash: state holds
    only hashes whose event time is within ``late_threshold`` of the
    watermark, i.e. bounded by (arrival rate x threshold) rather than total
    crawl history — the streaming analogue of the batch loop's
    ``compact_seen`` retention bound. Exactly-once under AvailableNow; the
    normalization chain is the same ``with_url_columns`` kernel as batch, so
    batch and stream agree on which URLs collide (verified in tests).
    """
    cand = candidate_stream(urls.withWatermark(ts_col, late_threshold))
    return cand.dropDuplicatesWithinWatermark(["url_hash"])


def stateful_host_budget(requests: DataFrame, tokens_init: float = 2.0,
                         cap: float = 4.0, refill: float = 1.0) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``): the
    per-host politeness token bucket as continuous state over a stream of
    fetch requests — the streaming twin of the batch
    ``operators.frontier.politeness_budgets`` transition (tokens' =
    min(cap, tokens + refill) per micro-batch, debited by the batch's
    request count; cumulative request total carried in state).

    Emits one row per (host, micro-batch): (host, n_requests, tokens,
    total_requests). State is keyed by host — bounded by host cardinality,
    the same partitioning axis as the batch loop's host_state table.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            tokens, total = state.get
        else:
            tokens, total = float(tokens_init), 0
        tokens = min(cap, tokens + refill) - n
        total += n
        state.update((float(tokens), int(total)))
        yield pd.DataFrame(
            {"host": [key[0]], "n_requests": [n], "tokens": [float(tokens)],
             "total_requests": [total]}
        )

    return requests.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType="host string, n_requests long, tokens double, "
                         "total_requests long",
        stateStructType="tokens double, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, table_name: str,
                      checkpoint_dir: str, output_mode: str = "append"):
    """Drain everything currently available into a memory sink (test/dev) —
    batch-equivalent exactly-once semantics. Use output_mode='complete' for
    aggregated streams (append would withhold windows still under the
    watermark at end-of-input)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
