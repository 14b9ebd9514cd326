"""Oracle-checked window queries over ``events`` (SURVEY §2b X6).

DuckDB has no window-assignment operator, so the oracles derive the same
windows arithmetically: tumbling/sliding starts are epoch-aligned bucket
arithmetic; sessions are the classic gaps-and-islands rewrite. All window
keys are epoch-second bigints (see operators/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import windows as W
from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

# events.value summed exactly via decimal; 6dp scale (see registry.dec docs)
_VAL_SUM = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"


@register(
    "events_tumbling_window",
    oracle=f"""
        SELECT CAST(FLOOR(EPOCH(ts)/3600) AS BIGINT)*3600 AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {_VAL_SUM} AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="X6: tumbling 1h window per event_type",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.tumbling(ev, "ts", "1 hour", "event_type").agg(
        cnt("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "events_sliding_window",
    oracle=f"""
        SELECT CAST(FLOOR(EPOCH(ts)/1800) AS BIGINT)*1800 - off*1800 AS window_start,
               COUNT(*) AS n_events,
               {_VAL_SUM} AS sum_value
        FROM events, (VALUES (0), (1)) AS offs(off)
        GROUP BY 1
    """,
    doc="X6: sliding 1h/30m window — every event lands in exactly two "
        "windows; the oracle materializes both via the offset trick",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.sliding(ev, "ts", "1 hour", "30 minutes").agg(
        cnt("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "events_session_window",
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
    doc="X6: session window (30min gap) per user — F.session_window in Spark "
        "(merge while diff < gap, half-open [start, last+gap)); "
        "gaps-and-islands in the oracle",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(cnt("n_events"))
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("sw.start")).alias("session_start"),
        "n_events",
    )


@register(
    "events_range_frame_1h",
    oracle="""
        SELECT event_id, user_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_s,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                   AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="X6: value-based (RANGE) window frame — per event, the trailing "
        "hour's event count and exact-decimal value sum for the same "
        "user. RANGE frames need no tiebreaker: peers (equal ts_s) are "
        "included wholesale on both engines, so the frame is "
        "deterministic by definition. One shuffle+sort on (user_id, "
        "ts_s) serves both aggregates; at scale this is the sliding-"
        "lookback primitive (rate limiting, rolling spend, burst "
        "detection) that tumbling windows cannot express",
)
def events_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        ts_s.alias("ts_s"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    "events_sliding_distinct",
    oracle="""
        WITH ev AS (
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
            FROM events
        ), cov AS (
            SELECT user_id, (h - k.k) * 3600 AS window_start
            FROM ev CROSS JOIN LATERAL (
                SELECT unnest(range(0, 6)) AS k
            ) AS k(k)
        )
        SELECT window_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM cov GROUP BY window_start
    """,
    doc="Sliding-window distinct users (6 h window, 1 h slide) — the "
        "'concurrent-audience' metric, and the canonical hard-at-scale "
        "window op: each event lands in 6 windows, and DISTINCT forbids "
        "map-side combine of raw counts. Exact twin here (DuckDB "
        "replicates Spark's epoch-aligned window assignment); at 100 TB "
        "swap COUNT(DISTINCT) for approx_count_distinct or the HLL-merge "
        "building block (approx_hll_sketch_merge) which DOES combine "
        "map-side",
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").cast("long").alias("distinct_users"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "distinct_users",
        )
    )
