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


def test_late_events_beyond_watermark_dropped(spark, tmp_path):
    """The late-data contract, asserted with surgically-placed events:
    a second batch arriving BEHIND the advanced watermark must not re-open
    (or double-emit) a closed window; a late-but-within-watermark event
    still lands in its window. Synthetic events so the lateness is exact:
    watermark 2h, window 1h."""
    import datetime as dt

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def ev(i, hour, minute=0, etype="click"):
        return (
            i,
            dt.datetime(2024, 5, 1, hour, minute),
            1,
            etype,
            1.0,
            "{}",
        )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: events in windows 00 and 01, plus a head event at 06:00
    # that advances the watermark to 04:00 — windows 00-03 close.
    batch1 = spark.createDataFrame(
        [ev(1, 0), ev(2, 0, 30), ev(3, 1), ev(4, 6)], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    q = run_events_stream_availablenow(
        spark, src, batch1.schema, ckpt, out
    )
    q.awaitTermination(120)
    first = {
        (r.window_start, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    h0 = int(dt.datetime(2024, 5, 1, 0).replace(
        tzinfo=dt.timezone.utc).timestamp())
    assert (h0, 2) in first, first          # window 00 closed with 2 events
    assert (h0 + 3600, 1) in first, first   # window 01 closed with 1 event

    # Batch 2: one event at 00:45 — 5h15m behind the 04:00 watermark, into
    # the already-closed window 00 (must be DROPPED, not re-emitted); one
    # at 05:30 — within watermark, its window (05) still open.
    batch2 = spark.createDataFrame([ev(5, 0, 45), ev(6, 5, 30)], schema)
    batch2.coalesce(1).write.mode("append").parquet(src)
    q2 = run_events_stream_availablenow(
        spark, src, batch1.schema, ckpt, out
    )
    q2.awaitTermination(120)
    after = sorted(
        (r.window_start, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    # window 00 still counts exactly 2 (the 00:45 straggler was dropped,
    # and the closed window was not emitted a second time)
    assert [w for w in after if w[0] == h0] == [(h0, 2)], after
    # nothing about window 05 emitted yet either (it is still open:
    # watermark stays at 04:00 — appends only close strictly-older windows)
    assert all(w[0] < h0 + 4 * 3600 for w in after), after
