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


def test_pushdown_prunes_partitions_at_reader_level():
    """pushFilters absorbs region/keyword EqualTo/In completely (the
    predicate IS the partition-generation axis) and yields everything
    else back for Spark-side evaluation."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from youtube_etl_project_spark.sources.api_source import (
        YouTubeApiPushdownReader,
    )

    r = YouTubeApiPushdownReader(
        {"regions": "US,IN,GB", "keywords": "music,news",
         "resultsPerCombo": "10"}
    )
    assert len(r.partitions()) == 6
    remaining = list(
        r.pushFilters(
            [
                EqualTo(("region",), "US"),
                In(("keyword",), ("music", "gaming")),
                GreaterThan(("views",), 100),  # not a partition axis
            ]
        )
    )
    # the one unsupported filter comes back; the two absorbed ones don't
    assert remaining == [GreaterThan(("views",), 100)]
    assert r.regions == ("US",) and r.keywords == ("music",)
    assert len(r.partitions()) == 1


def test_pushdown_prunes_planned_partitions_e2e(spark):
    """With the Spark 4.1 pushdown flag on, a plain df.filter on region
    prunes the planned InputPartitions (6 combos → 2) and the pruned
    scan returns exactly the rows the option-scoped scan produces."""
    from pyspark.sql import functions as F

    spark.dataSource.register(YouTubeApiStubDataSource)
    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        full = (
            spark.read.format("youtube_api_stub")
            .option("regions", "US,IN,GB")
            .option("keywords", "music,news")
            .option("resultsPerCombo", "10")
            .option("pushdown", "true")
            .load()
        )
        filtered = full.filter(F.col("region") == "US")
        # planning-time pruning: only US's 2 (region, keyword) combos scan
        assert filtered.rdd.getNumPartitions() == 2
        scoped = (
            spark.read.format("youtube_api_stub")
            .option("regions", "US")
            .option("keywords", "music,news")
            .option("resultsPerCombo", "10")
            .load()
        )
        assert sorted(map(tuple, filtered.collect())) == sorted(
            map(tuple, scoped.collect())
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_scan_equals_batch(spark, tmp_path):
    """T2 x S1: the streaming form of the API source (one page of every
    combo per micro-batch, offset = page) drains to exactly the batch
    scan's rows — the poll-loop-as-a-stream contract, with deterministic
    replay backing checkpointed exactly-once sinks."""
    import uuid as _uuid

    spark.dataSource.register(YouTubeApiStubDataSource)
    opts = {
        "regions": "US,IN",
        "keywords": "music,news",
        "resultsPerCombo": "10",
        "pageSize": "4",  # 3 pages per combo: 4 + 4 + 2
    }
    batch = spark.read.format("youtube_api_stub").options(**opts).load()

    name = "api_stream_" + _uuid.uuid4().hex[:10]
    reader = spark.readStream.format("youtube_api_stub")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table(name)

    assert streamed.count() == batch.count() == 40
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_stream_reader_replay_is_deterministic(spark):
    """readBetweenOffsets regenerates any page range bit-identically —
    the recovery path a restarted checkpointed query takes."""
    from youtube_etl_project_spark.sources.api_source import (
        YouTubeApiStreamReader,
    )

    r = YouTubeApiStreamReader(
        {"regions": "US", "keywords": "music", "resultsPerCombo": "10",
         "pageSize": "4"}
    )
    # walk the live path
    live = []
    off = r.initialOffset()
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            break
        live.extend(rows)
        off = nxt
    assert off == {"page": 3}  # 4 + 4 + 2 rows over 3 pages
    replay = list(r.readBetweenOffsets({"page": 0}, {"page": 3}))
    assert replay == live and len(live) == 10
