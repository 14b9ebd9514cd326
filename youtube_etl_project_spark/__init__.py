"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (Saranyajothis/youtube-etl-project),
re-expressed Spark-first, plus LLM-data-pipeline extension operators.

Layout:
    session.py          tuned SparkSession builder
    config.py           keyword/category lists (reference semantics)
    schemas.py          explicit StructTypes for the warehouse tables
    registry.py         query registry (queries() + oracle_sql() contract)
    functions/          scalar Column builders (text, classify, safe casts)
    operators/          relational ops, dedup, similarity, text, windows, upsert
    sources/            parquet catalog, JSON staging reader, partitioned sinks
    plans/              named queries mapped onto the driver fixture tables
    streaming/          incremental (availableNow) pipeline variants
"""

__version__ = "0.1.0"
