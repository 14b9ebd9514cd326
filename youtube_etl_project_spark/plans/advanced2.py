"""Second wave of engine-completeness queries: as-of join, TF-IDF,
pivot, and table profiling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.asof import asof_join
from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


@register(
    "asof_join_events",
    oracle="""
        SELECT p.event_id, p.user_id,
               v.event_id AS view_id_asof
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts > v.ts
    """,
    doc="As-of join: each purchase picks up the latest strictly-earlier view "
        "per user. Spark side is the union-merge form (one shuffle, linear — "
        "no candidate pairs); oracle uses DuckDB's native ASOF JOIN",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases, views, on="ts", keys=["user_id"], right_value_cols=["view_id"],
        strict=True,
    )
    return out.select("event_id", "user_id", "view_id_asof")


@register(
    "text_tfidf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text,' '),
                                              x -> x <> '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS BIGINT) AS tf,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        WHERE tf.tf >= 3
    """,
    doc="X4: TF-IDF — term frequency × inverse document frequency; df join "
        "broadcasts (vocabulary ≪ corpus), filtered to tf≥3 to bound output",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(cnt("tf"))
    # corpus size as a broadcast 1-row dimension, not a driver .count() —
    # keeps the whole computation one lazy plan
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
        .filter(F.col("tf") >= 3)
        .select("doc_id", "term", "tf", "tfidf")
    )


@register(
    "pivot_event_counts",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY user_id
    """,
    doc="Pivot (wide counts per category) with an explicit value list — "
        "explicit values keep the plan one-pass (no distinct-collect job)",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


@register(
    "unpivot_measures",
    oracle="""
        SELECT o_orderkey, measure, CAST(val AS DOUBLE) AS val
        FROM (
            SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS val
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
            FROM orders
        )
    """,
    doc="Unpivot (wide → long) via stack — the inverse of pivot",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', CAST(o_totalprice AS DOUBLE), "
            "'custkey', CAST(o_custkey AS DOUBLE)) AS (measure, val)"
        ),
    )


@register(
    "profile_table",
    oracle="""
        SELECT 'o_totalprice' AS col,
               COUNT(*) AS n_rows,
               CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
               COUNT(DISTINCT o_totalprice) AS n_distinct,
               ROUND(MIN(o_totalprice), 6) AS min_val,
               ROUND(MAX(o_totalprice), 6) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               COUNT(*),
               CAST(COUNT(o_custkey) AS BIGINT),
               COUNT(DISTINCT o_custkey),
               ROUND(MIN(o_custkey), 6),
               ROUND(MAX(o_custkey), 6)
        FROM orders
    """,
    doc="Data-profiling summary (count/nulls/distinct/min/max per column) — "
        "one scan per profile batch, the quality-report primitive",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return orders.agg(
            F.lit(col).alias("col"),
            cnt("n_rows"),
            F.count(col).cast("long").alias("n_nonnull"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.round(F.min(col).cast("double"), 6).alias("min_val"),
            F.round(F.max(col).cast("double"), 6).alias("max_val"),
        ).select("col", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")

    return prof("o_totalprice").unionByName(prof("o_custkey"))
