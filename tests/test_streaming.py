"""Structured Streaming surface: incremental rollup == batch rollup;
stateless candidate normalization streams."""

import pytest
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.streaming.events import (
    candidate_stream,
    read_events_stream,
    run_available_now,
    windowed_rollup,
)

SF = "/root/testdata/sf0.001"


def test_streaming_rollup_equals_batch(spark, tmp_path):
    # file-source streams need a directory; the sf events table is one file
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").repartition(4).write.parquet(
        events_dir
    )
    stream = read_events_stream(spark, events_dir)
    rolled = windowed_rollup(stream)
    run_available_now(rolled, "rollup_stream", str(tmp_path / "ckpt"),
                      output_mode="complete")
    got = {
        (r.hour, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("select * from rollup_stream").collect()
    }
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    want = {(r.hour, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert got == want


def test_candidate_stream_normalizes(spark, tmp_path):
    src = tmp_path / "urls"
    src.mkdir()
    spark.createDataFrame(
        [("HTTP://A.COM:80/x/../y?sid=s1&b=2",), ("not a url",)],
        "url string",
    ).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("url string").parquet(str(src))
    cand = candidate_stream(stream)
    assert cand.isStreaming
    run_available_now(cand, "cand_stream", str(tmp_path / "ckpt2"))
    rows = spark.sql("select * from cand_stream").collect()
    assert len(rows) == 1
    assert rows[0].url_canon == "http://a.com/y?b=2"
    assert rows[0].host == "a.com"


def test_stateful_host_budget(spark, tmp_path):
    # applyInPandasWithState token bucket: state carries (tokens, total)
    # across micro-batches; two files at maxFilesPerTrigger=1 -> 2 batches.
    import pandas as pd

    from url_pattern_algorithm_spark.streaming.events import (
        run_available_now,
        stateful_host_budget,
    )

    src = tmp_path / "reqs"
    src.mkdir()
    b1 = pd.DataFrame({"host": ["a.com"] * 3 + ["b.com"], "url": ["u"] * 4})
    b2 = pd.DataFrame({"host": ["a.com"] * 2, "url": ["u"] * 2})
    b1.to_parquet(src / "part-000.parquet")
    b2.to_parquet(src / "part-001.parquet")
    stream = (
        spark.readStream.schema("host string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stateful_host_budget(stream, tokens_init=2.0, cap=4.0, refill=1.0)
    run_available_now(out, "budget_updates", str(tmp_path / "ckpt"),
                      output_mode="update")
    rows = spark.sql("SELECT * FROM budget_updates").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    # a.com over both batches: totals accumulate to 5; tokens follow
    # min(cap, t + refill) - n per batch from t0=2: 3-3=0 then 1-2=-1
    a = sorted(by_host["a.com"], key=lambda r: r.total_requests)
    assert [r.total_requests for r in a] == [3, 5]
    assert [r.n_requests for r in a] == [3, 2]
    assert a[0].tokens == pytest.approx(0.0)
    assert a[1].tokens == pytest.approx(-1.0)
    b = by_host["b.com"]
    assert len(b) == 1 and b[0].total_requests == 1
    assert b[0].tokens == pytest.approx(2.0)
