"""Streaming: AvailableNow drain emits exactly the batch windows closed by
the final watermark (append mode holds the tail in state — that's the
late-data contract, not a bug); checkpoint gives exactly-once across
re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.streaming.pipeline import (
    run_events_stream_availablenow,
    windowed_event_stream,
)

WM_SEC = 2 * 3600  # watermark: 2 hours
WIN_SEC = 3600  # window: 1 hour


def _closed_batch_windows(spark, events):
    """Batch twin restricted to windows the final watermark has closed:
    window_end <= max(ts) - watermark."""
    max_ts = events.agg(F.unix_timestamp(F.max("ts")).alias("m")).collect()[0].m
    batch = windowed_event_stream(events, "ts", "1 hour", "2 hours", "event_type")
    return batch.filter(F.col("window_start") + WIN_SEC <= max_ts - WM_SEC)


def test_availablenow_emits_watermark_closed_windows(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_events_stream_availablenow(spark, src, events.schema, ckpt, out)
    q.awaitTermination(120)

    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    expected = sorted(map(tuple, _closed_batch_windows(spark, events).collect()))
    assert streamed == expected

    # second drain, same checkpoint: no new files → no duplicate emissions
    q2 = run_events_stream_availablenow(spark, src, events.schema, ckpt, out)
    q2.awaitTermination(120)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == expected


def test_incremental_picks_up_new_files_only(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    # split by TIME, as real incremental data arrives — a second batch of
    # *older* events would (correctly) be dropped as late beyond the
    # watermark, so id-parity splits don't model incremental ingest
    split = events.agg(
        F.percentile(F.unix_timestamp("ts"), 0.5).alias("m")
    ).collect()[0].m
    first = events.filter(F.unix_timestamp("ts") < split)
    second = events.filter(F.unix_timestamp("ts") >= split)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first.write.mode("append").parquet(src)
    q = run_events_stream_availablenow(spark, src, events.schema, ckpt, out)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    second.write.mode("append").parquet(src)
    q2 = run_events_stream_availablenow(spark, src, events.schema, ckpt, out)
    q2.awaitTermination(120)

    # after both increments: every watermark-closed window of the FULL
    # dataset emitted exactly once (count + mass), nothing double-counted
    final = spark.read.parquet(out)
    expected = _closed_batch_windows(spark, events)
    assert (
        final.agg(F.sum("n_events")).collect()[0][0]
        == expected.agg(F.sum("n_events")).collect()[0][0]
    )
    assert final.count() == expected.count()
