"""Custom Python DataSource (S1-S4): schema, deterministic content,
partition-parallel fan-out, and composition with DataFrame ops."""

from __future__ import annotations

import pytest

from youtube_etl_project_spark.sources.api_source import (
    YouTubeApiStubDataSource,
)


@pytest.fixture(scope="module")
def api_df(spark):
    spark.dataSource.register(YouTubeApiStubDataSource)
    return (
        spark.read.format("youtube_api_stub")
        .option("regions", "US,IN,GB")
        .option("keywords", "music,news")
        .option("resultsPerCombo", "10")
        .load()
    )


def test_fanout_cardinality_and_schema(api_df):
    # 3 regions x 2 keywords x 10 results
    assert api_df.count() == 60
    assert api_df.columns == [
        "video_id", "region", "keyword", "title", "views", "likes", "comments",
    ]


def test_deterministic_across_reads(api_df, spark):
    again = (
        spark.read.format("youtube_api_stub")
        .option("regions", "US,IN,GB")
        .option("keywords", "music,news")
        .option("resultsPerCombo", "10")
        .load()
    )
    assert sorted(map(tuple, api_df.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_pagination_splits_partitions(spark):
    df = (
        spark.read.format("youtube_api_stub")
        .option("regions", "US")
        .option("keywords", "music")
        .option("resultsPerCombo", "120")
        .option("pageSize", "50")
        .load()
    )
    # 120 results at page size 50 → 3 pages → 3 partitions
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 120


def test_composes_with_dataframe_ops(api_df):
    from pyspark.sql import functions as F

    agg = (
        api_df.groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("views").alias("v"))
        .collect()
    )
    assert {r.region for r in agg} == {"US", "IN", "GB"}
    assert all(r.n == 20 for r in agg)
