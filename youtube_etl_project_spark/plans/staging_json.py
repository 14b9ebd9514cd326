"""Semi-structured staging queries (SURVEY §2a S6/P7/F11, M3).

The file-based staging reader (JSON-array files + lineage + routing) is
exercised end-to-end in tests/test_staging.py — the driver's oracle only
sees the ten parquet views, so the oracle-checked queries here target the
``events.props`` JSON column, which is the same semi-structured surface
(VARIANT path extraction, one-shot from_json struct parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import cnt, lsum, register
from youtube_etl_project_spark.sources import load_table


@register(
    "from_json_struct",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k,
               event_type
        FROM events
    """,
    doc="P7/S6: one-shot from_json typed struct parse (preferred over "
        "per-field get_json_object — single parse per row; SL:111-129's "
        "19-path extraction collapses to one)",
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT", {"mode": "PERMISSIVE"})
    return ev.select(
        "event_id", parsed.getField("k").alias("k"), "event_type"
    )


@register(
    "staging_lineage_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_records,
               CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
        FROM events
        GROUP BY event_type
    """,
    doc="PERMISSIVE-parse health check: records whose semi-structured payload "
        "failed typed extraction (the reference swallows per-record errors, "
        "YC:34-36 — we count them instead)",
)
def staging_lineage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        cnt("n_records"),
        lsum(F.when(k.isNull(), 1).otherwise(0), "n_corrupt"),
    )
