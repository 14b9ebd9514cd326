"""Streaming queries under the ORACLE gate: the windowed rollup runs
through a real Structured Streaming drain (file source → window agg →
memory sink, Trigger.AvailableNow) and must hash-match the batch SQL
twin — batch/stream parity proven by the same machinery that checks
every batch operator, not just by pytest.

The memory sink holds only the aggregated frame (hours × event types —
model-sized); at production scale the same plan writes to a parquet/
Delta sink (streaming/pipeline.run_events_stream_availablenow) and the
memory sink remains the test harness.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


def _events_stream(spark: SparkSession, sf_dir: str):
    """Streaming source over the events table, layout-aware: a
    directory-shaped table (part files under events.parquet/) streams
    directly; a single-file table streams its parent with a glob filter
    (a glob on the parent would silently match ZERO part files in the
    directory case — measured: the scale-probe replicas read 0 rows).
    Applies the same nanos normalization as the batch catalog."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    raw = spark.read.parquet(path)
    if os.path.isdir(path):
        src = spark.readStream.schema(raw.schema).parquet(path)
    else:
        src = (
            spark.readStream.schema(raw.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if isinstance(src.schema["ts"].dataType, LongType):
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(src.schema["ts"].dataType, TimestampNTZType):
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


@register(
    "streaming_tumbling_parity",
    oracle="""
        SELECT CAST(FLOOR(EPOCH(ts)/3600) AS BIGINT)*3600 AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="T1/X6 through a REAL stream: the events table is consumed by a "
        "Structured Streaming file source (pathGlobFilter on the same "
        "parquet, same nanos normalization as the batch catalog), "
        "aggregated with the tumbling 1h window in complete mode, "
        "drained with Trigger.AvailableNow into a memory sink, and the "
        "drained result is what the oracle hashes against the batch SQL "
        "twin (events_tumbling_window's oracle verbatim). Exactly-once "
        "file-source semantics make the drain deterministic; decimal "
        "sums keep the values engine-exact",
)
def streaming_tumbling_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pins session confs (UTC, nanosAsLong) exactly like every batch query
    load_table(spark, sf_dir, "events")
    src = _events_stream(spark, sf_dir)

    agg = (
        src.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).cast("long").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = "stp_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "streaming_session_parity",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             < INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM events
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    doc="X6 sessionization through the STATEFUL streaming path: "
        "F.session_window (30min gap) over the streaming file source — "
        "the session-merge state machine, not a stateless projection — "
        "drained with AvailableNow and hash-matched against the batch "
        "gaps-and-islands oracle (events_session_window's verbatim). "
        "Proves streaming session state converges to exactly the batch "
        "answer on a bounded drain",
)
def streaming_session_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events")
    src = _events_stream(spark, sf_dir)

    agg = (
        src.groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start"))
            .cast("long")
            .alias("session_start"),
            "n_events",
        )
    )
    name = "ssp_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
