"""The custom Python DataSource (S1-S4) under the ORACLE gate.

The API-scan source (`sources/api_source.py` — the reference's paginated
search fan-out, reference `src/youtube_collector.py:150-200` +
`src/config.py:42-44`) was pytest-evidence only: its rows are produced
by executor-side Python, not SQL, so it never had a DuckDB twin. But the
deterministic stand-in generator is sha256-seeded, and DuckDB has
sha256 — so the oracle can rebuild every row from the generating formula
over the same (region, keyword, index) grid, seed arithmetic in UBIGINT
(verified bit-equal to Python's ``int.from_bytes(digest[:8], 'big')``).
A single flipped byte anywhere in the partition fan-out, pagination
offsets, or row assembly fails the value hash.

At 100 TB posture the point is the SHAPE: each (region, keyword) page
range is an InputPartition, so the API fan-out parallelizes across
executors with no driver-side loop; swap the generator for an HTTP
client and the plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_project_spark.registry import REGISTRY, register

_REGIONS = ("US", "IN", "GB")
_KEYWORDS = ("music", "news")
_PER_COMBO = 10


def _values(vals: tuple[str, ...]) -> str:
    return ", ".join(f"('{v}')" for v in vals)


@register(
    "api_scan_parity",
    oracle=f"""
        WITH regions(region) AS (VALUES {_values(_REGIONS)}),
        keywords(keyword) AS (VALUES {_values(_KEYWORDS)}),
        idx AS (SELECT range AS i FROM range({_PER_COMBO})),
        g AS (
            SELECT region, keyword, i,
                   ('0x' || substr(sha256(region || '|' || keyword || '|'
                                          || i::VARCHAR), 1, 16))::UBIGINT
                       AS seed
            FROM regions, keywords, idx
        )
        SELECT 'vid_' || lpad((seed % 1000000000000)::VARCHAR, 12, '0')
                   AS video_id,
               region, keyword,
               keyword || ' video ' || i::VARCHAR || ' (' || region || ')'
                   AS title,
               CAST(seed % 1000000 AS BIGINT) AS views,
               CAST((seed // 7) % 50000 AS BIGINT) AS likes,
               CAST((seed // 11) % 5000 AS BIGINT) AS comments
        FROM g
    """,
    doc="S1-S4 value-hash proof: the custom Python DataSource's full "
        "scan (3 regions × 2 keywords × 10 results, partition-parallel "
        "pagination) hash-matched against a DuckDB rebuild of the "
        "sha256-seeded generator — the first oracle-gated row for the "
        "DataSource itself (previously pytest-only). Seed arithmetic is "
        "UBIGINT end-to-end, bit-equal to Python's "
        "int.from_bytes(sha256(...)[:8]); any drift in the fan-out, "
        "offsets, or row assembly fails the hash. sf_dir is unused — "
        "the source IS the data",
)
def api_scan_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.sources.api_source import (
        YouTubeApiStubDataSource,
    )

    # idempotent per session: re-registering the same name is allowed
    spark.dataSource.register(YouTubeApiStubDataSource)
    return (
        spark.read.format("youtube_api_stub")
        .option("regions", ",".join(_REGIONS))
        .option("keywords", ",".join(_KEYWORDS))
        .option("resultsPerCombo", str(_PER_COMBO))
        .load()
    )


# Same reconstruction oracle as the batch scan: the stream must drain to
# exactly the rows the batch scan produces (pages are the only division).
_API_ORACLE = REGISTRY["api_scan_parity"].oracle


@register(
    "api_stream_parity",
    oracle=_API_ORACLE,
    doc="T2 x S1 under the VALUE-HASH gate (VERDICT r6 #4): the "
        "SimpleDataSourceStreamReader form of the API source — one page "
        "of every (region, keyword) combination per micro-batch, offset "
        "= page number — drained through a real Structured Streaming "
        "query (append mode, memory sink, 3-row pages so the drain "
        "spans 4 micro-batches) and hash-matched against the SAME "
        "sha256-reconstruction oracle as the batch scan. Proves the "
        "streamed pagination covers the identical row set with no "
        "duplicate or dropped page; replays are exact "
        "(readBetweenOffsets regenerates any page range), which is what "
        "makes the source safe under checkpointed exactly-once sinks",
)
def api_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from youtube_etl_project_spark.sources.api_source import (
        YouTubeApiStubDataSource,
    )

    spark.dataSource.register(YouTubeApiStubDataSource)
    src = (
        spark.readStream.format("youtube_api_stub")
        .option("regions", ",".join(_REGIONS))
        .option("keywords", ",".join(_KEYWORDS))
        .option("resultsPerCombo", str(_PER_COMBO))
        .option("pageSize", "3")  # 4 pages per combo: 3+3+3+1
        .load()
    )
    name = "api_stream_" + uuid.uuid4().hex[:12]
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
