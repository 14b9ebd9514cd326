"""Explicit StructTypes for the warehouse tables.

Mirrors the reference's declared-schema warehouse layer (DDL + ``::`` casts in
``src/snowflake_loader.py:44-50,73-77,107-133``) mapped onto Spark types per
SURVEY.md §1.2. Staging stays schema-on-read (JSON string column); core and
analytics tables are fixed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw video record as emitted by the extractor (flat projection of the
# nested API payload; cf. reference src/youtube_collector.py:152-168).
VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("channel_id", T.StringType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("published_at", T.StringType()),
        T.StructField("view_count", T.LongType()),
        T.StructField("like_count", T.LongType()),
        T.StructField("comment_count", T.LongType()),
        T.StructField("engagement_rate", T.DoubleType()),
        T.StructField("search_keyword", T.StringType()),
        T.StructField("search_region", T.StringType()),
        T.StructField("collected_at", T.StringType()),
        T.StructField("final_sentiment", T.StringType()),
        T.StructField("classification_method", T.StringType()),
        T.StructField("positive_keyword_count", T.IntegerType()),
        T.StructField("negative_keyword_count", T.IntegerType()),
    ]
)

# Channel record (cf. reference src/youtube_collector.py:186-192).
CHANNEL_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType()),
        T.StructField("channel_title", T.StringType()),
        T.StructField("channel_country", T.StringType()),
        T.StructField("subscriber_count", T.LongType()),
        T.StructField("video_count", T.LongType()),
    ]
)

# Staging table: semi-structured rows + lineage
# (cf. reference src/snowflake_loader.py:44-50).
STG_VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("raw_json", T.StringType()),
        T.StructField("load_timestamp", T.TimestampType()),
        T.StructField("file_name", T.StringType()),
    ]
)

# Channel dimension with SCD-lite bookkeeping
# (cf. reference src/snowflake_loader.py:86-104).
DIM_CHANNELS_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType()),
        T.StructField("channel_title", T.StringType()),
        T.StructField("channel_country", T.StringType()),
        T.StructField("subscriber_count", T.LongType()),
        T.StructField("video_count", T.LongType()),
        T.StructField("first_seen_date", T.DateType()),
        T.StructField("last_updated", T.TimestampType()),
    ]
)

# Fact table, 19 typed columns (cf. reference src/snowflake_loader.py:107-133).
FACT_VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("channel_id", T.StringType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("published_at", T.TimestampType()),
        T.StructField("view_count", T.LongType()),
        T.StructField("like_count", T.LongType()),
        T.StructField("comment_count", T.LongType()),
        T.StructField("engagement_rate", T.DoubleType()),
        T.StructField("search_keyword", T.StringType()),
        T.StructField("search_region", T.StringType()),
        T.StructField("collected_at", T.TimestampType()),
        T.StructField("collection_date", T.DateType()),
        T.StructField("final_sentiment", T.StringType()),
        T.StructField("classification_method", T.StringType()),
        T.StructField("positive_keyword_count", T.IntegerType()),
        T.StructField("negative_keyword_count", T.IntegerType()),
    ]
)

# Daily aggregate (cf. reference azure-functions/function_app.py:489-500).
AGG_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("analysis_date", T.DateType()),
        T.StructField("channel_country", T.StringType()),
        T.StructField("final_sentiment", T.StringType()),
        T.StructField("video_count", T.LongType()),
        T.StructField("total_views", T.LongType()),
        T.StructField("total_likes", T.LongType()),
        T.StructField("total_comments", T.LongType()),
        T.StructField("avg_engagement_rate", T.DoubleType()),
    ]
)

# Multimodal column convention (extension X5): opaque binary payload plus a
# typed metadata struct; Parquet stores BinaryType natively and the metadata
# struct prunes independently of the payload bytes.
MULTIMODAL_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)
