"""Wave 10: event-path analysis, JSON-map explode, grouped percentiles,
and decimal-exact covariance — rounding out the analytics surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, LongType
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


@register(
    "event_path_trigrams",
    oracle="""
        WITH seq AS (
            SELECT event_type AS a,
                   LEAD(event_type, 1) OVER w AS b,
                   LEAD(event_type, 2) OVER w AS c
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n
        FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path ASC
        LIMIT 20
    """,
    doc="Path analysis: top-20 per-user event-type trigrams (the 'what do "
        "users do next' query). One window shuffle on user_id feeds both "
        "LEADs; ties in ts broken by event_id so sequences are identical "
        "across engines",
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        seq.select(F.concat_ws(">", "a", "b", "c").alias("path"))
        .groupBy("path")
        .agg(cnt("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


@register(
    "props_map_explode",
    oracle="""
        SELECT k AS prop_key,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.' || k)
                             AS BIGINT)) AS BIGINT) AS sum_value
        FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
        GROUP BY 1
    """,
    doc="Semi-structured map explosion: props JSON → typed MapType → "
        "explode to (key, value) rows → aggregate per key. The schema-free "
        "twin of from_json-with-struct (P7): map keys need no schema "
        "declaration, so new properties flow through without DDL",
)
def props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), LongType()))
    return (
        ev.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(cnt("n"), F.sum("v").cast("long").alias("sum_value"))
    )


@register(
    "percentile_by_type",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    doc="Grouped exact interpolated percentiles (the per-category latency "
        "SLO query) — Spark percentile == DuckDB quantile_cont, same "
        "(1-g)*lo + g*hi interpolation. At 100 TB switch to "
        "approx_percentile (KLL-style mergeable sketch, X7)",
)
def percentile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


@register(
    "covariance_price_qty",
    oracle="""
        SELECT l_returnflag,
               ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar
        FROM (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))
                            * CAST(l_extendedprice AS DECIMAL(28,8)))
                        AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                       AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                        AS DOUBLE) AS sy
            FROM lineitem
            GROUP BY l_returnflag
        )
    """,
    doc="Sample covariance from decimal-exact sums (never covar_samp "
        "built-ins: their streaming accumulation order differs between "
        "engines) — the moments come out of one aggregate pass, the "
        "covariance is derived arithmetic on exact parts",
)
def covariance_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d8 = lambda c: F.col(c).cast("decimal(28,8)")  # noqa: E731
    d4 = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d8("l_quantity") * d8("l_extendedprice"))
        .cast("double")
        .alias("sxy"),
        F.sum(d4("l_quantity")).cast("double").alias("sx"),
        F.sum(d4("l_extendedprice")).cast("double").alias("sy"),
    )
    covar = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    return agg.select("l_returnflag", F.round(covar, 6).alias("covar"))


@register(
    "events_gap_fill_ffill",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       AS day_total
            FROM events
            WHERE event_type = 'purchase' AND value > 250
            GROUP BY 1
        ), spine AS (
            SELECT CAST(unnest(generate_series(
                       MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
            FROM daily
        )
        SELECT s.day, d.day_total,
               last_value(d.day_total IGNORE NULLS)
                   OVER (ORDER BY s.day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled
        FROM spine s LEFT JOIN daily d USING (day)
    """,
    doc="Calendar gap-fill + forward-fill: generate the date spine with "
        "sequence() between the observed bounds, left-join the sparse "
        "daily aggregate, carry the last observation forward with "
        "last(ignorenulls) over an ordered frame. The spine and window "
        "run at DAY cardinality (the aggregate shrinks events first), so "
        "the global order-by is over hundreds of rows even at 100 TB of "
        "events; gap days keep a NULL day_total next to their filled value",
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.registry import dec_sum

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 250)
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        dec_sum("value", "day_total")
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            "day_total",
            F.last("day_total", ignorenulls=True).over(w).alias("filled"),
        )
    )


@register(
    "events_gap_fill_interp",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                       AS day_val
            FROM events WHERE value > 300
            GROUP BY 1, 2
        ), spine AS (
            SELECT event_type,
                   CAST(unnest(generate_series(
                       MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
            FROM daily GROUP BY event_type
        ), joined AS (
            SELECT s.event_type, s.day, d.day_val
            FROM spine s LEFT JOIN daily d USING (event_type, day)
        ), ctx AS (
            SELECT event_type, day, day_val,
                   last_value(day_val IGNORE NULLS) OVER w_prev AS prev_v,
                   last_value(CASE WHEN day_val IS NOT NULL THEN day END
                              IGNORE NULLS) OVER w_prev AS prev_d,
                   first_value(day_val IGNORE NULLS) OVER w_next AS next_v,
                   first_value(CASE WHEN day_val IS NOT NULL THEN day END
                               IGNORE NULLS) OVER w_next AS next_d
            FROM joined
            WINDOW w_prev AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW),
                   w_next AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, day, day_val,
               CASE WHEN day_val IS NOT NULL THEN day_val
                    ELSE (prev_v * (next_d - day) + next_v * (day - prev_d))
                         // (next_d - prev_d)
               END AS filled,
               CAST(day_val IS NOT NULL AS BIGINT) AS is_observed
        FROM ctx
    """,
    doc="Calendar gap-fill with LINEAR interpolation, the keyed sibling "
        "of events_gap_fill_ffill: per-type date spine between observed "
        "bounds, then each gap day takes the distance-weighted average "
        "of its bracketing observations. The whole path is exact bigint "
        "arithmetic — daily sums land on a decimal(18,4)*10000 integer "
        "grid, and the interpolation uses the weighted form "
        "(prev*(next_d-day) + next*(day-prev_d)) div span, whose "
        "numerator stays non-negative so Spark's truncating div and "
        "DuckDB's // agree. Spine bounds per key mean every gap has "
        "both neighbors (no edge NULLs); windows are PARTITIONED by "
        "event_type and run at day cardinality after the aggregate "
        "shrinks events, so nothing here is a global sort even at 100 TB",
)
def events_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 300)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("day_val")
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
        )
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w_prev = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("day_val").isNotNull(), F.col("day"))
    ctx = joined.select(
        "event_type",
        "day",
        "day_val",
        F.last("day_val", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("day_val", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = F.expr(
        "(prev_v * datediff(next_d, day) + next_v * datediff(day, prev_d))"
        " div datediff(next_d, prev_d)"
    )
    return ctx.select(
        "event_type",
        "day",
        "day_val",
        F.when(F.col("day_val").isNotNull(), F.col("day_val"))
        .otherwise(interp)
        .alias("filled"),
        F.col("day_val").isNotNull().cast("long").alias("is_observed"),
    )
