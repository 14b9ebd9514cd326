"""Approximate + exact-twin aggregates (SURVEY §2b X7).

The approx variants (HLL, t-digest-ish quantile sketches) use different
sketch implementations in Spark vs DuckDB, so they get rows-only checks;
each has an exact oracle-checked twin so the semantics stay pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "exact_distinct_users",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    doc="X7 twin: exact distinct count (two-phase partial aggregation)",
)
def exact_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )


@register(
    "approx_distinct_users",
    oracle=None,  # HLL++ (Spark) vs DuckDB's HLL — different sketches
    doc="X7: approx_count_distinct (HyperLogLog++, rsd=0.01) — constant "
        "memory per group at 100 TB where exact distinct would spill",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx")
    )


@register(
    "percentile_value",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.25), 6) AS p25,
               ROUND(quantile_cont(value, 0.50), 6) AS p50,
               ROUND(quantile_cont(value, 0.75), 6) AS p75
        FROM events GROUP BY event_type
    """,
    doc="X7 twin: exact interpolated percentiles",
)
def percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 6).alias("p25"),
        F.round(F.percentile("value", 0.50), 6).alias("p50"),
        F.round(F.percentile("value", 0.75), 6).alias("p75"),
    )


@register(
    "approx_percentile_value",
    oracle=None,  # sketch-based, engine-specific
    doc="X7: percentile_approx — mergeable quantile sketch for 100 TB "
        "group-bys",
)
def approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx")
    )
