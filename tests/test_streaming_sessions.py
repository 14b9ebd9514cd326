"""Streaming session windows: an AvailableNow drain must emit exactly the
batch session windows closed by the final watermark (sessions still able
to grow are held in state — the late-data contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.streaming.pipeline import sessionized_event_stream

WM_SEC = 2 * 3600


def test_availablenow_session_drain_matches_closed_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        sessionized_event_stream(stream, "ts", "30 minutes", "2 hours", "user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    max_ts = events.agg(F.unix_timestamp(F.max("ts")).alias("m")).collect()[0].m
    batch = sessionized_event_stream(
        events, "ts", "30 minutes", "2 hours", "user_id"
    ).filter(F.col("session_end") <= max_ts - WM_SEC)

    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    expected = sorted(map(tuple, batch.collect()))
    assert streamed == expected
    assert len(expected) > 0
