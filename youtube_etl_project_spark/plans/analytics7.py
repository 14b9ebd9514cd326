"""Wave 14: time-series smoothing (EWMA), hour-of-week seasonality, and
RFM customer segmentation — the remaining product-analytics staples.

EWMA is recursive (y_t = αx_t + (1-α)y_{t-1}), which neither engine's
aggregate set expresses directly; both sides use the same closed form
over an ordered running sum (u_i = x_i(1-α)^{-i}), valid because the
series is ≤ ~30 steps so (1-α)^{-t} stays ≪ 1/ε_double — documented
precision bound, not an accident."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

_ALPHA = 0.25


@register(
    "events_ewma_daily",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS DOUBLE) AS x
            FROM events GROUP BY 1, 2
        ), numbered AS (
            SELECT event_type, day, x,
                   ROW_NUMBER() OVER w AS t,
                   FIRST_VALUE(x) OVER w AS x1
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ), idx AS (
            SELECT event_type, day, x, t, x1,
                   SUM(x * power(1 - {_ALPHA}, -t))
                       OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS c
            FROM numbered
        )
        SELECT event_type, day,
               CAST(x AS BIGINT) AS n_events,
               ROUND(CASE WHEN t = 1 THEN x
                          ELSE {_ALPHA} * power(1 - {_ALPHA}, t)
                               * (c - x1 / (1 - {_ALPHA}))
                               + power(1 - {_ALPHA}, t - 1) * x1
                     END, 6) AS ewma
        FROM idx
    """,
    doc="Per-type EWMA of daily volume (α=0.25, y_1=x_1) — the smoothed "
        "trend line dashboards plot next to raw counts. The recursion is "
        "rewritten as one ordered running sum of x_i(1-α)^{-i} (running "
        "sums evaluate in window order on both engines, so the doubles "
        "are bit-identical before the final 6-dp round). Numerically "
        "bounded: (1-α)^{-t} ≈ 4e3 at t=30, far from the 1e16 double "
        "cliff; for unbounded series, chunk by (1-α)^{-t} range. One "
        "shuffle on event_type feeds index, running sum, and first-value",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = _ALPHA
    idx = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number().over(w).alias("t"),
        F.sum(
            F.col("x") * F.pow(F.lit(1 - a), -F.row_number().over(w))
        ).over(wrun).alias("c"),
        F.first("x").over(w).alias("x1"),
    )
    ewma = F.when(F.col("t") == 1, F.col("x")).otherwise(
        a
        * F.pow(F.lit(1 - a), F.col("t"))
        * (F.col("c") - F.col("x1") / (1 - a))
        + F.pow(F.lit(1 - a), F.col("t") - 1) * F.col("x1")
    )
    return idx.select(
        "event_type",
        "day",
        F.col("x").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )


@register(
    "events_hourly_seasonality",
    oracle="""
        WITH cells AS (
            SELECT isodow(ts) - 1 AS dow, date_part('hour', ts) AS hour,
                   COUNT(*) AS n,
                   COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
            FROM events GROUP BY 1, 2
        )
        SELECT dow, hour,
               CAST(n AS BIGINT) AS n_events,
               ROUND(CAST(n AS DOUBLE) / n_days, 6) AS per_day
        FROM cells
    """,
    doc="Hour-of-week seasonality surface: volume per (weekday, hour) "
        "cell, normalized by how many distinct dates fed the cell so "
        "partial weeks don't bias the profile. Weekday aligned across "
        "engines as Monday=0 (Spark weekday == DuckDB isodow-1). Single "
        "shuffle into 168 cells — the aggregate any 100 TB scan reduces "
        "to trivially",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.weekday("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
        .select(
            "dow",
            "hour",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("n").cast("double") / F.col("n_days"), 6).alias(
                "per_day"
            ),
        )
    )


@register(
    "orders_rfm_segments",
    oracle="""
        WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
        rfm AS (
            SELECT o_custkey,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                             MIN(mx.md)) AS recency,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
            FROM orders CROSS JOIN mx
            GROUP BY o_custkey
        ), tiles AS (
            SELECT o_custkey, monetary,
                   NTILE(4) OVER (ORDER BY recency ASC, o_custkey)
                       AS r_tile,
                   NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)
                       AS f_tile,
                   NTILE(4) OVER (ORDER BY monetary DESC, o_custkey)
                       AS m_tile
            FROM rfm
        )
        SELECT r_tile, f_tile, m_tile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(CAST(SUM(monetary) AS DOUBLE) / COUNT(*), 4)
                   AS avg_monetary
        FROM tiles
        GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary, "
        "quartiled (NTILE with explicit custkey tiebreaks — identical "
        "bucketing on both engines), rolled up to the 64-segment grid. "
        "Monetary sums in the decimal domain. The three global NTILEs "
        "are single-partition windows over the CUSTOMER aggregate (rows "
        "= customers, not orders) — acceptable to ~10^8 customers; "
        "beyond that switch to approx_percentile cut points, which is "
        "how percentile_by_type's sketch twin scales",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    rfm = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.min("md"), F.max(F.to_date("o_orderdate"))).alias(
                "recency"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                "monetary"
            ),
        )
    )
    tiles = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency"), F.asc("o_custkey")))
        .alias("r_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_tile"),
    )
    return (
        tiles.groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            cnt("n_customers"),
            F.round(
                F.sum("monetary").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_monetary"),
        )
    )
