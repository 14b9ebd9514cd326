"""Sources & sinks: parquet catalog over the fixture tables, JSON-array
staging reader with file lineage, and date-partitioned sinks."""

from youtube_etl_project_spark.sources.catalog import load_table, load_tables

__all__ = ["load_table", "load_tables"]
