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


@register(
    "events_ab_ttest",
    oracle="""
        WITH g AS (
            SELECT event_type, user_id % 2 AS variant,
                   CAST(COUNT(value) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(28,10))
                            * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s2
            FROM events GROUP BY 1, 2
        ), v AS (
            SELECT event_type, variant, n, s1 / n AS mean,
                   GREATEST(s2 - s1 * s1 / n, 0) / (n - 1) AS var
            FROM g WHERE n >= 2
        ), ab AS (
            SELECT a.event_type,
                   a.n AS n_a, b.n AS n_b,
                   a.mean AS mean_a, b.mean AS mean_b,
                   a.var / a.n + b.var / b.n AS se2,
                   a.var / a.n AS ra, b.var / b.n AS rb,
                   a.n AS na, b.n AS nb
            FROM v a JOIN v b
              ON a.event_type = b.event_type
             AND a.variant = 0 AND b.variant = 1
        )
        SELECT event_type, n_a, n_b,
               ROUND(mean_a, 6) AS mean_a,
               ROUND(mean_b, 6) AS mean_b,
               CASE WHEN se2 > 0
                    THEN ROUND((mean_a - mean_b) / sqrt(se2), 6) END
                   AS t_stat,
               CASE WHEN ra + rb > 0 AND (ra > 0 OR rb > 0)
                    THEN ROUND((ra + rb) * (ra + rb)
                               / (ra * ra / (na - 1) + rb * rb / (nb - 1)),
                               4) END AS welch_df
        FROM ab
    """,
    doc="Experimentation staple: Welch's unequal-variance t-test per "
        "event_type between two deterministic variants (user_id parity — "
        "the hash-bucket assignment every A/B platform uses). Means and "
        "variances come from decimal-exact S1/S2 partial sums (the "
        "zscore_by_type rule: never STDDEV built-ins, their accumulation "
        "order differs between engines), so the t statistic and "
        "Welch-Satterthwaite df are a handful of correctly-rounded "
        "double ops on identical inputs. One shuffle on (type, variant); "
        "the 2×|types| stat table then self-joins broadcast-sized",
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d6 = F.col("value").cast("decimal(18,6)")
    d10 = F.col("value").cast("decimal(28,10)")
    g = (
        ev.groupBy("event_type", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count("value").cast("long").alias("n"),
            F.sum(d6).cast("double").alias("s1"),
            F.sum(d10 * d10).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= 2)
        .withColumn("mean", F.col("s1") / F.col("n"))
        .withColumn(
            "var",
            F.greatest(
                F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"),
                F.lit(0.0),
            )
            / (F.col("n") - 1),
        )
    )
    a = g.filter("variant = 0").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = g.filter("variant = 1").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    ra = F.col("var_a") / F.col("n_a")
    rb = F.col("var_b") / F.col("n_b")
    se2 = ra + rb
    t = F.when(se2 > 0, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2))
    df_ = F.when(
        se2 > 0,
        se2 * se2
        / (ra * ra / (F.col("n_a") - 1) + rb * rb / (F.col("n_b") - 1)),
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df_, 4).alias("welch_df"),
    )
