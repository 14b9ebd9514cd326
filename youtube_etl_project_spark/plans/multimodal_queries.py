"""Multimodal column queries (SURVEY §2b X5).

The payload bytes are derived from the documents fixture (no image libs in
the container); everything Spark-side — binary column, metadata struct,
Arrow-batched mapInPandas decode — is the real production shape, and the
stub decode's deterministic arithmetic gives both queries true oracles
(including the UDF path: the oracle recomputes the fake measurements in
SQL, proving the Arrow plumbing end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import multimodal
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               'image' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
    doc="X5: opaque binary payload + typed metadata struct; metadata-only "
        "scans never touch payload bytes (column pruning)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.attach_payload(docs, "text", kind="image")
    return mm.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


@register(
    "multimodal_decode",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
               CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
        FROM documents
    """,
    doc="X5: Arrow-batched mapInPandas decode (stubbed byte decode, real "
        "batch shape/schema/partitioning) — oracle recomputes the stub's "
        "deterministic measurements, verifying the pandas-UDF path itself",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.attach_payload(docs, "text", kind="image")
    return multimodal.decode_features(mm, "doc_id")
