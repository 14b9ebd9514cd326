"""Custom Python DataSource: the reference's API-scan surface as a native
Spark source (SURVEY §2a S1-S4).

The reference scans a paginated HTTP API per (region, keyword) combination
(reference: ``src/youtube_collector.py:150-200`` search pagination,
``src/config.py:42-44`` region × keyword fan-out). Spark-first, that scan
IS a data source: each (region, keyword) page range becomes an
``InputPartition``, so the fan-out parallelizes across executors, the
schema is declared once, and downstream queries compose with the whole
DataFrame surface. Partition *generation* is driven by the ``regions`` /
``keywords`` options, so callers scope the fan-out up front; on top of
that, ``pushFilters`` (Spark 4.1 Python DataSource pushdown; opt in with
``.option("pushdown", "true")`` under
``spark.sql.python.filterPushdown.enabled=true``) absorbs
``region = ...`` / ``keyword IN (...)`` predicates at planning time, so
a plain ``df.filter(...)`` prunes the (region, keyword) fan-out to
exactly the requested combinations instead of scanning all partitions —
the Spark analogue of the reference pushing ``publishedAfter`` into the
API call (reference ``azure-functions/function_app.py:71``).

No network in this environment, so the fetch is a deterministic synthetic
generator (seeded by region/keyword/offset) behind the same interface a
real HTTP client would implement — swap ``_fetch_page`` for a requests
call and nothing else changes. This is the idiomatic Spark 4 shape for
"read from an API at scale": pagination state lives in partitions, not in
a driver-side loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_REGIONS = ("US", "IN", "GB", "PK", "CA")
DEFAULT_KEYWORDS = ("music", "news", "sports", "gaming", "tech", "food")

SCHEMA = (
    "video_id string, region string, keyword string, title string, "
    "views bigint, likes bigint, comments bigint"
)


def _h(*parts: object) -> int:
    raw = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def _fetch_page(
    region: str, keyword: str, offset: int, page_size: int
) -> list[tuple]:
    """Deterministic stand-in for one API page (replace with HTTP client)."""
    rows = []
    for i in range(offset, offset + page_size):
        seed = _h(region, keyword, i)
        rows.append(
            (
                f"vid_{seed % 10**12:012d}",
                region,
                keyword,
                f"{keyword} video {i} ({region})",
                seed % 1_000_000,
                (seed // 7) % 50_000,
                (seed // 11) % 5_000,
            )
        )
    return rows


class YouTubeApiPartition(InputPartition):
    def __init__(self, region: str, keyword: str, offset: int, size: int):
        self.region = region
        self.keyword = keyword
        self.offset = offset
        self.size = size


class YouTubeApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.regions: Sequence[str] = tuple(
            t.strip()
            for t in (
                options.get("regions") or ",".join(DEFAULT_REGIONS)
            ).split(",")
            if t.strip()
        )
        self.keywords: Sequence[str] = tuple(
            t.strip()
            for t in (
                options.get("keywords") or ",".join(DEFAULT_KEYWORDS)
            ).split(",")
            if t.strip()
        )
        self.per_combo = int(options.get("resultsPerCombo", "10"))
        # API page limit: the reference chunks requests at 50 ids
        # (src/youtube_collector.py:181); same bound per partition here
        self.page_size = min(int(options.get("pageSize", "50")), 50)

    def partitions(self) -> list[YouTubeApiPartition]:
        parts = []
        for r in self.regions:
            for k in self.keywords:
                for off in range(0, self.per_combo, self.page_size):
                    parts.append(
                        YouTubeApiPartition(
                            r, k, off, min(self.page_size, self.per_combo - off)
                        )
                    )
        return parts

    def read(self, partition: YouTubeApiPartition) -> Iterator[tuple]:
        yield from _fetch_page(
            partition.region,
            partition.keyword,
            partition.offset,
            partition.size,
        )


class YouTubeApiPushdownReader(YouTubeApiReader):
    """Pushdown-capable variant (VERDICT r6 #3). Spark 4.1 REJECTS any
    reader that overrides ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false, so the override
    lives on a subclass that the DataSource hands out only when the
    active session has the flag on — a plain/vanilla session keeps the
    base reader and post-scan Spark filters, bit-identical results either
    way."""

    # Planning-time partition pruning: region/keyword predicates are
    # exactly the partition-generation axes, so EqualTo/In on them can be
    # absorbed completely — every row a pruned scan emits already
    # satisfies the predicate, hence the filter is NOT returned for
    # post-scan re-evaluation (the reference's publishedAfter-in-the-API
    # -call shape). Everything else stays Spark-side.
    _PUSHABLE = ("region", "keyword")

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            values: tuple | None = None
            if isinstance(f, EqualTo):
                values = (f.value,)
            elif isinstance(f, In):
                values = tuple(f.value)
            if (
                values is not None
                and len(f.attribute) == 1
                and f.attribute[0] in self._PUSHABLE
                and all(isinstance(v, str) for v in values)
            ):
                keep = set(values)
                if f.attribute[0] == "region":
                    self.regions = tuple(
                        r for r in self.regions if r in keep
                    )
                else:
                    self.keywords = tuple(
                        k for k in self.keywords if k in keep
                    )
            else:
                yield f


class YouTubeApiStubDataSource(DataSource):
    """Register with ``spark.dataSource.register(YouTubeApiStubDataSource)``
    then ``spark.read.format("youtube_api_stub").option(...).load()``.

    Pass ``.option("pushdown", "true")`` (with the session conf
    ``spark.sql.python.filterPushdown.enabled=true``) to get the
    pushdown-capable reader. The selection must be an explicit option,
    not conf sniffing: ``reader()`` is constructed inside Spark's Python
    planning worker where no SparkSession exists, and a reader that
    overrides ``pushFilters`` under a flag-off session is a hard
    AnalysisException in Spark 4.1 — so the default reader stays
    override-free and vanilla-session-safe."""

    @classmethod
    def name(cls) -> str:
        return "youtube_api_stub"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> YouTubeApiReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return YouTubeApiPushdownReader(self.options)
        return YouTubeApiReader(self.options)

    def simpleStreamReader(self, schema) -> "YouTubeApiStreamReader":
        return YouTubeApiStreamReader(self.options)


class YouTubeApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the scan (T2 × S1): the reference polls the API
    on a timer (`azure-functions/function_app.py:275-528` daily trigger);
    streamed, each micro-batch advances ONE page of every (region,
    keyword) combination and the offset {"page": n} is the resume point.
    Replays are exact (``readBetweenOffsets`` regenerates any page
    range deterministically), so the source composes with checkpointed
    exactly-once sinks; a real HTTP client would substitute
    ``_fetch_page`` and carry the API's own page tokens in the offset.

    Bounded here (``resultsPerCombo`` caps the pages) so a drain
    terminates: after the last page ``read`` returns an empty batch with
    an unchanged offset, which is the "no new data" signal
    ``processAllAvailable``/AvailableNow terminate on.
    """

    def __init__(self, options: dict):
        inner = YouTubeApiReader(options)
        self.regions = inner.regions
        self.keywords = inner.keywords
        self.per_combo = inner.per_combo
        self.page_size = inner.page_size

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_rows(self, page: int) -> list[tuple]:
        off = page * self.page_size
        size = min(self.page_size, self.per_combo - off)
        if size <= 0:
            return []
        rows: list[tuple] = []
        for r in self.regions:
            for k in self.keywords:
                rows.extend(_fetch_page(r, k, off, size))
        return rows

    def read(self, start: dict):
        page = int(start["page"])
        rows = self._page_rows(page)
        if not rows:  # exhausted: unchanged offset = no new data
            return iter(()), start
        return iter(rows), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for page in range(int(start["page"]), int(end["page"])):
            yield from self._page_rows(page)
