"""Coverage wave 5: full-outer join, explicit null ordering, the corpus
quality-filter funnel, and two more classic TPC-H join-agg shapes (Q10
returned-item revenue, Q18 large-order HAVING semi-join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, dec, register
from youtube_etl_project_spark.sources import load_table


@register(
    "join_full_outer_daily",
    oracle="""
        WITH a AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_click
            FROM events WHERE event_type = 'click' GROUP BY 1
        ), b AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_view
            FROM events WHERE event_type = 'view' GROUP BY 1
        )
        SELECT COALESCE(a.day, b.day) AS day,
               COALESCE(n_click, 0) AS n_click,
               COALESCE(n_view, 0) AS n_view
        FROM a FULL OUTER JOIN b ON a.day = b.day
    """,
    doc="Full-outer join of two per-day aggregates with COALESCE gap fill "
        "— the metric-reconciliation shape. Both sides pre-aggregate "
        "before the join, so the shuffle moves days, not events",
)
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(cnt("n_click"))
    )
    b = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(day)
        .agg(cnt("n_view"))
    )
    return a.join(b, "day", "full_outer").select(
        "day",
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_view", F.lit(0)).alias("n_view"),
    )


@register(
    "sort_nulls_explicit",
    oracle="""
        SELECT event_id, v
        FROM (
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE value END AS v
            FROM events
        )
        ORDER BY v ASC NULLS LAST, event_id ASC
        LIMIT 100
    """,
    doc="Explicit NULLS LAST top-k: Spark's ASC default is nulls-FIRST, "
        "DuckDB's is nulls-LAST — any cross-engine sort must pin the null "
        "position explicitly (asc_nulls_last) plus a unique tiebreaker, or "
        "the LIMIT frontier silently diverges",
)
def sort_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    return (
        ev.select("event_id", v.alias("v"))
        .orderBy(F.col("v").asc_nulls_last(), F.col("event_id").asc())
        .limit(100)
    )


@register(
    "corpus_filter_funnel",
    oracle="""
        WITH flags AS (
            SELECT n_chars BETWEEN 100 AND 20000 AS f_len,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       >= 20 AS f_words,
                   lang = 'en' AS f_lang,
                   doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
                       AS f_canonical
            FROM documents
        )
        SELECT COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_len,
               CAST(SUM(CASE WHEN f_len AND f_words THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN f_len AND f_words AND f_lang
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(SUM(CASE WHEN f_len AND f_words AND f_lang
                    AND f_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_final
        FROM flags
    """,
    doc="The corpus-cleaning funnel in one pass: length gate → word-count "
        "quality gate → language gate → exact-dedup survivor, reported as "
        "cumulative survival counts (the per-stage yield dashboard every "
        "training-data pipeline publishes). One window shuffle on the "
        "content hash + one scalar aggregate; conditional sums instead of "
        "four separate filtered scans",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256))
    n_words = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    )
    flags = docs.select(
        F.col("n_chars").between(100, 20000).alias("f_len"),
        (n_words >= 20).alias("f_words"),
        (F.col("lang") == "en").alias("f_lang"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("f_canonical"),
    )

    def stage(*conds: str) -> F.Column:
        keep = F.lit(True)
        for c in conds:
            keep = keep & F.col(c)
        return F.sum(F.when(keep, 1).otherwise(0)).cast("long")

    return flags.agg(
        cnt("n_total"),
        stage("f_len").alias("n_len"),
        stage("f_len", "f_words").alias("n_quality"),
        stage("f_len", "f_words", "f_lang").alias("n_lang"),
        stage("f_len", "f_words", "f_lang", "f_canonical").alias("n_final"),
    )


@register(
    "tpch_q10_returned_revenue",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
                   AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer — fact filter "
        "pushed to the lineitem scan, dims broadcast, one agg shuffle on "
        "the customer key",
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (
        F.lit(1) - dec("l_discount", "decimal(8,4)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
        )
        GROUP BY c_custkey, o_orderkey, CAST(o_orderdate AS DATE)
    """,
    doc="TPC-H Q18 shape: HAVING subquery → left-semi join against an "
        "aggregate (Catalyst plans the IN as a shuffle-semi on orderkey), "
        "then re-aggregate the surviving orders",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .select("c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter-scan-aggregate — every predicate "
        "reaches the parquet scan (PushedFilters), no join, no shuffle "
        "beyond the scalar-aggregate gather; the query whose runtime IS "
        "the scan throughput",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", "decimal(8,4)"))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q14_promo_share",
    oracle="""
        SELECT ROUND(
                 CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice AS DECIMAL(18,4))
                               * (1 - CAST(l_discount AS DECIMAL(8,4)))
                          ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l_discount AS DECIMAL(8,4))))
                        AS DOUBLE), 6) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="TPC-H Q14 shape: conditional revenue share after a broadcast "
        "dim join — CASE inside the aggregate, one pass, one scalar out",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(28,8)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_share")
        )
    )
