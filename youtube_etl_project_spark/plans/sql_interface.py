"""Queries exercised through the ``spark.sql`` surface (rather than the
DataFrame API) — proving the engine's SQL entry point end-to-end, including
a scalar correlated subquery and a ranked-subquery QUALIFY rewrite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sql import sql


@register(
    "sql_flagship",
    oracle="""
        SELECT n_name AS channel_country,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="SQL surface: same text runs on spark.sql and DuckDB (ANSI subset)",
)
def sql_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(
        spark,
        sf_dir,
        """
        SELECT n_name AS channel_country,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )


@register(
    "sql_correlated_subquery",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    doc="SQL surface: scalar subquery predicate (A6 family) via spark.sql",
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """,
    )


@register(
    "sql_qualify_rewrite",
    oracle="""
        SELECT user_id, event_id
        FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="SQL surface: the QUALIFY-less latest-per-key rewrite (W1, SL:82) "
        "as literal SQL text — OSS Spark SQL has no QUALIFY",
)
def sql_qualify_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(
        spark,
        sf_dir,
        """
        SELECT user_id, event_id
        FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        """,
    )
