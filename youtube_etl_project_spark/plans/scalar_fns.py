"""Scalar function queries (SURVEY §2a F1-F11): the reference's per-row
logic — text assembly, keyword-hit counting, the sentiment CASE, engagement
rate, defensive casts, date formatting, explode — exercised as full queries
with DuckDB oracles.

All of these are pure Column expressions (one whole-stage-codegen span, no
Python, no shuffle except where a groupBy is the point) — the property that
makes them free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.functions import (
    classify_sentiment,
    engagement_rate,
    keyword_hits,
    safe_long,
    text_blob,
)
from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

# Domain keyword lists for the documents fixture (its vocabulary is
# query-engine words, so the reference's sentiment words would never hit;
# the *semantics* — counted substring containment — are identical).
DOC_POSITIVE = ["fast", "vector", "merge", "hash", "stream"]
DOC_NEGATIVE = ["slow", "small", "batch", "row", "spill"]


def _like_count_sql(col: str, words: list[str]) -> str:
    return " + ".join(
        f"(CASE WHEN {col} LIKE '%{w}%' THEN 1 ELSE 0 END)" for w in words
    )


@register(
    "fn_text_blob",
    oracle="""
        SELECT doc_id, lower(source || ' ' || text) AS blob
        FROM documents
    """,
    doc="F1: lower-cased space-joined text assembly (YC:74)",
)
def fn_text_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text_blob("source", "text").alias("blob"))


@register(
    "fn_keyword_hits",
    oracle=f"""
        SELECT doc_id,
               {_like_count_sql('text', DOC_POSITIVE)} AS pos_hits,
               {_like_count_sql('text', DOC_NEGATIVE)} AS neg_hits
        FROM documents
    """,
    doc="F2: counted substring containment per keyword list (YC:77-78)",
)
def fn_keyword_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        keyword_hits("text", DOC_POSITIVE).alias("pos_hits"),
        keyword_hits("text", DOC_NEGATIVE).alias("neg_hits"),
    )


def _classify_case_sql() -> str:
    pos = _like_count_sql("text", DOC_POSITIVE)
    neg = _like_count_sql("text", DOC_NEGATIVE)
    return f"""
        SELECT doc_id,
               CASE
                 WHEN cat IN (19,26,27,28,29) THEN 'POSITIVE'
                 WHEN cat IN (20,23,24,25) THEN 'NEGATIVE'
                 WHEN cat IN (1,2,10,15,17,22) THEN
                   CASE WHEN p > n THEN 'POSITIVE'
                        WHEN n > p THEN 'NEGATIVE'
                        ELSE 'NEUTRAL' END
                 ELSE 'UNKNOWN'
               END AS final_sentiment,
               CASE
                 WHEN cat IN (19,26,27,28,29,20,23,24,25) THEN 'CATEGORY_BASED'
                 WHEN cat IN (1,2,10,15,17,22) THEN 'KEYWORD_BASED'
                 ELSE 'UNCATEGORIZED'
               END AS classification_method,
               p AS positive_keyword_count,
               n AS negative_keyword_count
        FROM (
            SELECT doc_id,
                   CAST(doc_id % 30 AS INTEGER) AS cat,
                   {pos} AS p,
                   {neg} AS n
            FROM documents
        )
    """


@register(
    "fn_classify_sentiment",
    oracle=_classify_case_sql(),
    doc="F3: the full sentiment CASE — category precedence, keyword fallback, "
        "tie→NEUTRAL, 4-field struct (YC:66-104)",
)
def fn_classify_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "cat", (F.col("doc_id") % 30).cast("int")
    )
    cls = classify_sentiment(
        "cat",
        "text",
        positive_keywords=DOC_POSITIVE,
        negative_keywords=DOC_NEGATIVE,
    )
    return docs.select("doc_id", cls.alias("c")).select(
        "doc_id",
        "c.final_sentiment",
        "c.classification_method",
        "c.positive_keyword_count",
        "c.negative_keyword_count",
    )


@register(
    "fn_engagement_rate",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN views = 0 THEN 0.0
                    ELSE ROUND((l_suppkey + l_linenumber) / views * 100, 4)
               END AS engagement_rate
        FROM (
            SELECT l_orderkey, l_linenumber, l_suppkey,
                   CASE WHEN l_linenumber = 1 THEN 0 ELSE l_partkey END AS views
            FROM lineitem
        )
    """,
    doc="F4: engagement rate with zero-view guard and round-4 (YC:106-116)",
)
def fn_engagement_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "views",
        F.when(F.col("l_linenumber") == 1, F.lit(0)).otherwise(F.col("l_partkey")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        engagement_rate("views", "l_suppkey", "l_linenumber").alias(
            "engagement_rate"
        ),
    )


@register(
    "fn_safe_long",
    oracle="""
        SELECT event_id,
               COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
               COALESCE(CAST(json_extract_string(props, '$.missing') AS BIGINT), 0)
                   AS missing_defaulted
        FROM events
    """,
    doc="F5/P2: null-safe typed extraction with defaults (int(x.get(k,0)), YC:160-162)",
)
def fn_safe_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        safe_long(F.get_json_object("props", "$.k")).alias("k"),
        safe_long(F.get_json_object("props", "$.missing")).alias("missing_defaulted"),
    )


@register(
    "fn_dates",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               strftime(o_orderdate, '%Y/%m/%d') AS date_path,
               CAST(year(o_orderdate) AS INTEGER) AS order_year
        FROM orders
    """,
    doc="F7/F8/F9: DATE() truncation + date-path formatting (SL:127; YC:204-206)",
)
def fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("date_path"),
        F.year("o_orderdate").alias("order_year"),
    )


@register(
    "fn_format_string",
    oracle="""
        SELECT printf('%s|%05d|%s', c_name, c_custkey, c_mktsegment) AS line
        FROM customer
    """,
    doc="F12: formatted report lines (print_summary alignment, SL:162-193)",
)
def fn_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.format_string("%s|%05d|%s", "c_name", "c_custkey", "c_mktsegment").alias(
            "line"
        )
    )


@register(
    "explode_tokens",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
    """,
    doc="F11: LATERAL FLATTEN / array explode + count (SL:58,79)",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(cnt("n"))
    )
