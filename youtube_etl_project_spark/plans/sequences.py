"""Wave 8: ordered-event-sequence analytics (conversion funnel) and the
full ranking-function family — the remaining ANSI window surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1
        ), c AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
            WHERE e.event_type = 'click' GROUP BY 1
        ), p AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
            WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase
    """,
    doc="Ordered-sequence funnel: users who viewed, then clicked strictly "
        "after their first view, then purchased strictly after that click. "
        "Each stage is a groupBy + re-join on user_id — one key, so every "
        "shuffle lands on the same partitioning and AQE reuses exchanges; "
        "no window over the full event stream needed",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
            .withColumnRenamed("t2", "t")
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = first_after(v, "click")
    p = first_after(c, "purchase")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


@register(
    "window_rank_family",
    oracle="""
        SELECT event_id, event_type,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pr,
               ROUND(CUME_DIST() OVER w, 6) AS cd,
               FIRST_VALUE(event_id) OVER w AS first_id,
               LAG(event_id, 2) OVER w AS lag2_id
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
    doc="The complete ANSI ranking family in one window spec — rank, "
        "dense_rank, ntile, percent_rank, cume_dist, first_value, offset "
        "lag — sharing a single sort+shuffle (Spark plans one Window "
        "node). Ties broken by event_id so both engines rank identically",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("event_id").over(w).alias("first_id"),
        F.lag("event_id", 2).over(w).alias("lag2_id"),
    )
