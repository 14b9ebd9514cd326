"""Streaming ingestion dedup (dropDuplicatesWithinWatermark) and
stream-static enrichment joins, drained with AvailableNow."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from youtube_etl_project_spark.streaming.pipeline import (
    deduped_event_stream,
    enriched_event_stream,
)

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 12, minute)


def _drain(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_drops_redelivered_keys(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: event 1 delivered twice (same key, later ts), event 2 once
    b1 = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(1), 10), (2, _ts(2), 20)], _SCHEMA
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    _drain(deduped_event_stream(stream, "ts", "10 minutes", "event_id"), out, ckpt)

    got = {r.event_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}
    assert spark.read.parquet(out).count() == 2

    # batch 2: event 1 redelivered within the watermark → dropped;
    # event 3 is new → kept
    b2 = spark.createDataFrame([(1, _ts(3), 10), (3, _ts(4), 30)], _SCHEMA)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    _drain(deduped_event_stream(stream, "ts", "10 minutes", "event_id"), out, ckpt)

    rows = spark.read.parquet(out).collect()
    assert {r.event_id for r in rows} == {1, 2, 3}
    assert len(rows) == 3


def test_batch_twin_same_semantics(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(1), 10), (2, _ts(2), 20)], _SCHEMA
    )
    assert deduped_event_stream(df, "ts", "10 minutes", "event_id").count() == 2


def test_stream_static_join_enriches_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "basic")], "user_id long, tier string"
    )

    spark.createDataFrame(
        [(1, _ts(0), 10), (2, _ts(1), 20), (3, _ts(2), 99)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    _drain(enriched_event_stream(stream, dim, "user_id"), out, ckpt)

    got = {(r.event_id, r.tier) for r in spark.read.parquet(out).collect()}
    # left join: unknown user 99 survives with null tier
    assert got == {(1, "gold"), (2, "basic"), (3, None)}
