"""transformWithStateInPandas (Spark 4 state v2): running totals accumulate
across micro-batches, matching the applyInPandasWithState v1 operator.

The state-v2 protocol needs ``google.protobuf`` in the streaming Python
worker; environments without it (like this container) get a skip — the v1
operator (test_stateful.py) covers the same semantics everywhere."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.streaming.stateful import running_user_totals_v2

pytest.importorskip(
    "google.protobuf", reason="transformWithState protocol requires protobuf"
)


def _drain(spark, src, schema, ckpt, out):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_totals_v2(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_v2_totals_accumulate_across_batches(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    first.write.mode("append").parquet(src)
    _drain(spark, src, events.schema, ckpt, out)
    second.write.mode("append").parquet(src)
    _drain(spark, src, events.schema, ckpt, out)

    emitted = spark.read.parquet(out)
    latest = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .select("user_id", "n_events", "total_value")
    )
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in latest.collect()}
    want = {
        r.user_id: (r.n_events, round(r.total_value, 6)) for r in expected.collect()
    }
    assert got == want
