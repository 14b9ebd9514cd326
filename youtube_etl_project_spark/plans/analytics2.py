"""Analytics coverage wave 4: running/frame window metrics, retention
cohorts, histograms, GROUPING SETS, blocked fuzzy matching, and int8
embedding quantization. All oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.sql import sql


@register(
    "events_running_metrics",
    oracle="""
        SELECT event_id, user_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_s,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_s,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE)
                   / COUNT(*) OVER w3 AS mov_avg3
        FROM events
        WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="Window-frame coverage in one pass over one partitioning: running "
        "cumulative sum, LAG inter-event gap, 3-row moving average. One "
        "shuffle on user_id serves all three frames (Spark plans a single "
        "Window node); decimal sums keep both engines bit-identical",
)
def events_running_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec_v = F.col("value").cast("decimal(18,6)")
    ts_s = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        ts_s.alias("ts_s"),
        F.sum(dec_v).over(w_cum).cast("double").alias("cum_value"),
        (ts_s - F.lag(ts_s).over(w)).alias("gap_s"),
        (
            F.sum(dec_v).over(w3).cast("double") / F.count(F.lit(1)).over(w3)
        ).alias("mov_avg3"),
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT cohort_day,
               date_diff('day', cohort_day, CAST(ts AS DATE)) AS day_offset,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM events e JOIN firsts USING (user_id)
        GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: first-seen day per user × activity-day "
        "offset × distinct actives. The firsts aggregate is tiny relative "
        "to events (one row per user) — at scale both the agg and the "
        "re-join shuffle on user_id, so AQE coalesces them into one "
        "exchange reuse",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "histogram_value",
    oracle="""
        SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
               COUNT(*) AS n_events,
               MIN(value) AS min_v,
               MAX(value) AS max_v
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1
    """,
    doc="Fixed-width histogram via floor-bucket arithmetic (width_bucket "
        "without the function — identical semantics in both engines); "
        "min/max are exact on doubles so no decimal detour needed",
)
def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        ev.groupBy(F.floor(F.col("value") / 50).alias("bucket"))
        .agg(
            cnt("n_events"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT COALESCE(n_name, '(all)') AS nation,
           COALESCE(c_mktsegment, '(all)') AS segment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
"""


@register(
    "sql_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    doc="GROUPING SETS (the general form behind rollup/cube, SURVEY §2a "
        "A-family): same ANSI text runs on spark.sql and DuckDB; Spark "
        "expands to a single Expand + one shuffle, not one scan per set",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _GROUPING_SETS_SQL)


@register(
    "fuzzy_match_levenshtein",
    oracle="""
        SELECT a.c_nationkey AS nationkey, COUNT(*) AS n_close_pairs
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        GROUP BY 1
    """,
    doc="Blocked fuzzy matching: block on an equality key (nation) so the "
        "edit-distance predicate only runs within blocks — the classic "
        "entity-resolution shape. Spark's 3-arg levenshtein(threshold) "
        "early-exits the DP once the bound is exceeded",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, "nationkey")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.levenshtein("name_a", "name_b", 1) != -1)
        .groupBy("nationkey")
        .agg(cnt("n_close_pairs"))
    )


@register(
    "embed_quantize_int8",
    oracle="""
        WITH m AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))) AS mx
            FROM embeddings
        )
        SELECT vec_id,
               ROUND(127.0 / mx, 6) AS scale,
               CAST(list_sum(list_transform(e, x ->
                    greatest(-127, least(127,
                        CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT)))))
                    AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(e, x ->
                    abs(greatest(-127, least(127,
                        CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT))))))
                    AS BIGINT) AS q_l1
        FROM m
    """,
    doc="X3 support: symmetric int8 quantization (per-vector max-abs scale, "
        "floor(x*s+0.5) explicit half-up rounding — deterministic across "
        "engines, unlike ROUND on ties) — 4× memory cut for ANN candidate "
        "storage. Pure higher-order array functions, no UDF. scale and the "
        "quantized array are materialized through named projections before "
        "re-use: referencing the array_max fold inside the quantize lambda "
        "would re-evaluate it per element (O(d²)/row at production dims)",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    staged = emb.select("vec_id", ed.alias("ed")).select(
        "vec_id",
        "ed",
        (
            F.lit(127.0)
            / F.array_max(F.transform("ed", lambda x: F.abs(x)))
        ).alias("scale"),
    )
    q = F.transform(
        "ed",
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x * F.col("scale") + F.lit(0.5)),
            ),
        ),
    )
    zero = F.lit(0).cast("long")
    return staged.select("vec_id", "scale", q.alias("q")).select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate("q", zero, lambda acc, x: acc + x).alias("q_sum"),
        F.aggregate("q", zero, lambda acc, x: acc + F.abs(x)).alias("q_l1"),
    )
