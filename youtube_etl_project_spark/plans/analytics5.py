"""Wave 12: product-analytics staples not yet in the registry — robust
(median/MAD) dispersion, lag-based sessionization, MAD anomaly flagging on
the daily series, and audience-overlap Jaccard between event types. All
oracle-checked; every stage shuffles on a real key (user_id / event_type /
day), never on a data-sized artifact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


@register(
    "robust_stats_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               ROUND(MIN(m.med), 6) AS median_value,
               ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    """,
    doc="Robust dispersion: per-type median and median-absolute-deviation "
        "(the outlier-resistant mean/stddev replacement — the quality-"
        "filter thresholding statistic). Two-pass by necessity (MAD is a "
        "median OF deviations FROM a median): pass 1 aggregates 5 group "
        "medians, the tiny result broadcasts back, pass 2 re-aggregates "
        "deviations — the fact side shuffles once, on event_type. Spark "
        "percentile == DuckDB quantile_cont (same interpolation)",
)
def robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), 0.5), 6
            ).alias("mad"),
        )
    )


@register(
    "sessionize_lag_gaps",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   LAG(epoch_us(ts)) OVER w AS prev_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), marked AS (
            SELECT user_id, event_id, us,
                   CASE WHEN prev_us IS NULL
                             OR us - prev_us > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_s
            FROM gaps
        ), sess AS (
            SELECT user_id, us,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        ), per_sess AS (
            SELECT user_id, session_id,
                   COUNT(*) AS n_events,
                   MAX(us) - MIN(us) AS dur_us
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(MAX(n_events) AS BIGINT) AS longest_session_events,
               CAST(MAX(dur_us) AS BIGINT) AS longest_session_us
        FROM per_sess GROUP BY user_id
    """,
    doc="Manual sessionization (the pre-session_window primitive, and the "
        "one that works in plain batch SQL): LAG gap > 30 min starts a new "
        "session, running SUM of starts numbers sessions, two-level "
        "rollup. One shuffle on user_id feeds LAG, the running sum, AND "
        "the (user, session) aggregate — Catalyst reuses the partitioning. "
        "Event times compared in epoch-µs (bigint) so engines can't "
        "diverge on timestamp subtraction; ties broken by event_id",
)
def sessionize_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tiebreak on the running sum too: two events with an
    # identical (user_id, us) would otherwise be ordered differently by
    # the ROWS frame on each engine/run, moving a tied row across a
    # session boundary (ADVICE r2)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    ).select(
        "user_id",
        "event_id",
        "us",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > 1800 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marked.select(
        "user_id", "us", F.sum("new_s").over(wrun).alias("session_id")
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return per_sess.groupBy("user_id").agg(
        cnt("n_sessions"),
        F.max("n_events").cast("long").alias("longest_session_events"),
        F.max("dur_us").cast("long").alias("longest_session_us"),
    )


@register(
    "daily_anomaly_mad",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY 1
        ), med AS (
            SELECT quantile_cont(n, 0.5) AS med FROM daily
        ), mad AS (
            SELECT quantile_cont(abs(d.n - m.med), 0.5) AS mad
            FROM daily d CROSS JOIN med m
        )
        SELECT d.day,
               CAST(d.n AS BIGINT) AS n_events,
               ROUND(abs(d.n - m.med) / NULLIF(x.mad, 0), 6) AS mad_score
        FROM daily d CROSS JOIN med m CROSS JOIN mad x
        WHERE abs(d.n - m.med) > 2 * x.mad
    """,
    doc="Time-series anomaly flagging: days whose event volume deviates "
        "from the median by > 2 MADs (robust z-score — immune to the "
        "outliers it hunts, unlike mean/stddev). The daily rollup is the "
        "only data-sized aggregation; median and MAD are scalar aggregates "
        "over ~days rows that broadcast back as 1-row literals",
)
def daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    med = daily.agg(F.percentile("n", 0.5).alias("med"))
    with_med = daily.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), 0.5).alias("mad")
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("n") - F.col("med")) > 2 * F.col("mad"))
        .select(
            "day",
            F.col("n").cast("long").alias("n_events"),
            F.round(
                F.abs(F.col("n") - F.col("med"))
                / F.nullif(F.col("mad"), F.lit(0.0)),
                6,
            ).alias("mad_score"),
        )
    )


@register(
    "audience_overlap",
    oracle="""
        WITH tu AS (
            SELECT DISTINCT event_type, user_id FROM events
        ), sizes AS (
            SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type
        ), inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS both_users
            FROM tu a JOIN tu b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT i.type_a, i.type_b,
               CAST(i.both_users AS BIGINT) AS both_users,
               ROUND(CAST(i.both_users AS DOUBLE)
                     / (sa.n + sb.n - i.both_users), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.type_a
        JOIN sizes sb ON sb.event_type = i.type_b
    """,
    doc="Audience-overlap matrix: per event-type pair, the distinct-user "
        "intersection and Jaccard similarity (the cross-feature usage "
        "report). The fact table collapses to distinct (type, user) FIRST "
        "— the self-join runs on the collapsed set keyed on user_id, and "
        "the per-type size table (5 rows) broadcasts. At 100 TB the exact "
        "intersection swaps for HLL sketch unions (approx_hll_sketch_merge "
        "is the registered building block)",
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("both_users").cast("long").alias("both_users"),
            F.round(
                F.col("both_users").cast("double")
                / (F.col("na") + F.col("nb") - F.col("both_users")),
                6,
            ).alias("jaccard"),
        )
    )
