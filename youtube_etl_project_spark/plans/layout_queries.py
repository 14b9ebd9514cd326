"""Z-order layout queries: the Morton-key computation that drives
``operators/layout.write_zordered`` — registered so the bit-interleave
arithmetic itself is oracle-checked (the layout *effect* — per-file
bounding boxes shrinking in both dimensions — is measured by
tests/test_layout.py, since file placement is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.layout import morton_key, morton_sql
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

_BITS = 10


@register(
    "events_zorder_key",
    oracle=f"""
        SELECT event_id,
               {morton_sql("(user_id % 1024)",
                           "(CAST(FLOOR(value) AS BIGINT) % 1024)",
                           _BITS)} AS zkey
        FROM events
    """,
    doc="Morton (Z-order) key over (user_id, floor(value)) — the "
        "clustering key write_zordered range-partitions on so parquet/"
        "manifest min-max stats prune 2-d box predicates (the lakehouse "
        "OPTIMIZE ZORDER layout, re-expressed as pure bit arithmetic in "
        "whole-stage codegen; identical shift/mask term order on both "
        "engines). Dims fold into the 2^10 key domain with % so the key "
        "width is fixed regardless of id range",
)
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 1024
    b = F.floor(F.col("value")).cast("long") % 1024
    return ev.select("event_id", morton_key(a, b, _BITS).alias("zkey"))
