"""SQL interface: register the catalog as temp views so users can drive the
engine with ``spark.sql`` (Spark SQL is the parser/optimizer — SURVEY §7's
"explicitly not built: a SQL parser").

One caveat carried from the reference analysis (SURVEY §2a W1): OSS Spark
SQL has no ``QUALIFY`` — latest-per-key dedup must be written as a ranked
subquery (or use the DataFrame helper sources/staging.latest_per_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_project_spark.sources.catalog import TABLES, load_table


def register_catalog(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per fixture table; returns names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views then run a SQL query against them."""
    register_catalog(spark, sf_dir)
    return spark.sql(query)
