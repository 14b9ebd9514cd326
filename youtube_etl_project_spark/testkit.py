"""Fixture builders for the reference-shaped pipeline tests (FIXTURES.md §B).

Writes JSON-array files in the collector's sink layout
(``raw/YYYY/MM/DD/{videos,channels}_<ts>.json`` — reference
src/youtube_collector.py:205-232; filenames must contain ``videos_`` /
``channels_`` because loader routing is a filename LIKE predicate).
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime, timezone

from youtube_etl_project_spark.sources.staging import date_path


def write_json_array_file(
    root: str, day: date, kind: str, records: list[dict], ts_suffix: str | None = None
) -> str:
    """One JSON array per file, named ``{kind}_{ts}.json`` under the date
    partition — later ts_suffix sorts later, which drives latest-file-wins."""
    d = date_path(root, day)
    os.makedirs(d, exist_ok=True)
    suffix = ts_suffix or datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S%f")
    path = os.path.join(d, f"{kind}_{suffix}.json")
    with open(path, "w") as f:
        json.dump(records, f, default=str)
    return path


def make_video(
    video_id: str,
    channel_id: str = "ch1",
    category_id: int = 1,
    title: str = "a title",
    description: str = "",
    tags: list[str] | None = None,
    view_count: int = 100,
    like_count: int = 10,
    comment_count: int = 2,
    published_at: str = "2024-03-01T00:00:00",
    collected_at: str = "2024-03-02T06:00:00",
    search_keyword: str = "news",
    search_region: str = "US",
) -> dict:
    """Raw (pre-enrichment) video record; cover cases per FIXTURES.md §B —
    keyword-bearing titles, zero views, duplicate ids, null ids."""
    return {
        "video_id": video_id,
        "channel_id": channel_id,
        "category_id": category_id,
        "title": title,
        "description": description,
        "tags": tags or [],
        "published_at": published_at,
        "view_count": view_count,
        "like_count": like_count,
        "comment_count": comment_count,
        "search_keyword": search_keyword,
        "search_region": search_region,
        "collected_at": collected_at,
    }


def make_channel(
    channel_id: str,
    channel_title: str = "chan",
    channel_country: str | None = "US",
    subscriber_count: int = 1000,
    video_count: int = 50,
) -> dict:
    return {
        "channel_id": channel_id,
        "channel_title": channel_title,
        "channel_country": channel_country,
        "subscriber_count": subscriber_count,
        "video_count": video_count,
    }
