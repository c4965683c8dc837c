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


def test_dedup_candidate_stream_first_wins(spark, tmp_path):
    # watermark-bounded streaming dedup == batch first-wins distinct on
    # url_hash: dupes within a micro-batch AND across micro-batches (inside
    # the watermark horizon) are dropped; normalization-equivalent spellings
    # collide because both paths share the with_url_columns kernel.
    import pandas as pd

    from url_pattern_algorithm_spark.streaming.events import (
        dedup_candidate_stream,
        run_available_now,
    )

    src = tmp_path / "cand"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01 09:00:00")
    b1 = pd.DataFrame({
        "url": [
            "http://a.com/x?b=2",
            "HTTP://A.COM:80/x?b=2",        # same canonical -> in-batch dupe
            "http://b.com/y",
        ],
        "ts": [t0, t0, t0],
    })
    b2 = pd.DataFrame({
        "url": [
            "http://a.com/./x?b=2",          # cross-batch dupe of b1 row 1
            "http://c.com/z",
        ],
        "ts": [t0 + pd.Timedelta(minutes=5)] * 2,
    })
    b1.to_parquet(src / "part-000.parquet", coerce_timestamps="us",
                  allow_truncated_timestamps=True)
    b2.to_parquet(src / "part-001.parquet", coerce_timestamps="us",
                  allow_truncated_timestamps=True)
    stream = (
        spark.readStream.schema("url string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = dedup_candidate_stream(stream, late_threshold="1 hour")
    assert out.isStreaming
    run_available_now(out, "dedup_cand", str(tmp_path / "ckpt"),
                      output_mode="append")
    rows = spark.sql("SELECT url_canon FROM dedup_cand").collect()
    assert sorted(r.url_canon for r in rows) == [
        "http://a.com/x?b=2", "http://b.com/y", "http://c.com/z",
    ]


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


def test_watermark_drops_late_events_across_restart(spark, tmp_path):
    # append-mode watermark semantics over two stream RUNS sharing one
    # checkpoint: run 1 advances the watermark to max_ts - 2h and finalizes
    # the closed window; run 2 delivers an event older than the committed
    # watermark (its window already emitted) which must be DROPPED, and an
    # in-threshold event which must stay in state (not emitted - no final
    # batch after it). File sink: appended rows survive the restart.
    import pandas as pd

    from url_pattern_algorithm_spark.streaming.events import (
        read_events_stream,
        windowed_rollup,
    )

    src = tmp_path / "ev"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "wmckpt")

    def write_batch(name, ts_list):
        pd.DataFrame({
            "event_id": range(len(ts_list)),
            "ts": pd.to_datetime(ts_list),
            "user_id": [1] * len(ts_list),
            "event_type": ["x"] * len(ts_list),
            "value": [1.0] * len(ts_list),
            "props": [""] * len(ts_list),
        }).to_parquet(src / name, coerce_timestamps="us",
                      allow_truncated_timestamps=True)

    def run():
        q = (
            windowed_rollup(read_events_stream(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: event at 09:30 (window [09:00,10:00)) + one at 13:00 that
    # pushes the watermark to 11:00 > 10:00 -> the 09:00 window finalizes
    write_batch("b1.parquet", ["2026-01-01 09:30:00", "2026-01-01 13:00:00"])
    run()
    rows1 = {(r.hour, r.n) for r in spark.read.parquet(out).collect()}
    assert ("2026-01-01 09", 1) in rows1

    # run 2: a too-late event for the closed window + an in-threshold one
    write_batch("b2.parquet", ["2026-01-01 09:45:00", "2026-01-01 12:50:00"])
    run()
    rows2 = [(r.hour, r.n) for r in spark.read.parquet(out).collect()]
    # the 09:00 window was emitted exactly once with n=1: the late event
    # neither re-emitted nor corrected it, and no 12:00 row appeared (its
    # window is still open under the restored watermark)
    assert sorted(rows2) == sorted(rows1)
