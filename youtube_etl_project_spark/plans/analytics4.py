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
