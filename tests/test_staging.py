"""Staging reader: JSON-array explode, lineage, routing, latest-per-key,
PERMISSIVE corruption handling."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from youtube_etl_project_spark import schemas
from youtube_etl_project_spark.sources.staging import (
    date_path,
    latest_per_key,
    read_json_array_files,
    route_files,
)
from youtube_etl_project_spark.testkit import make_channel, write_json_array_file

DAY = date(2024, 3, 2)


def test_read_json_array_with_lineage(spark, tmp_path):
    root = str(tmp_path / "raw")
    write_json_array_file(
        root, DAY, "channels", [make_channel("c1"), make_channel("c2")],
        ts_suffix="t1",
    )
    write_json_array_file(root, DAY, "videos", [{"video_id": "v1"}], ts_suffix="t1")
    staged = read_json_array_files(
        spark, date_path(root, DAY) + "/*", schemas.CHANNEL_SCHEMA
    )
    assert staged.count() == 3  # 2 channels + 1 video row (wrong-shaped)
    routed = route_files(staged, "channels_")
    rows = routed.select("record.channel_id", "file_name").collect()
    assert {r.channel_id for r in rows} == {"c1", "c2"}
    assert all("channels_t1" in r.file_name for r in rows)
    assert "raw_json" in staged.columns and "load_timestamp" in staged.columns


def test_latest_per_key_picks_newest_file(spark, tmp_path):
    root = str(tmp_path / "raw")
    write_json_array_file(
        root, DAY, "channels", [make_channel("c1", subscriber_count=1)],
        ts_suffix="20240302_060000",
    )
    write_json_array_file(
        root, DAY, "channels", [make_channel("c1", subscriber_count=2)],
        ts_suffix="20240302_070000",
    )
    staged = route_files(
        read_json_array_files(spark, date_path(root, DAY) + "/*", schemas.CHANNEL_SCHEMA),
        "channels_",
    ).select("record.*", "file_name")
    out = latest_per_key(staged, "channel_id").collect()
    assert len(out) == 1
    assert out[0].subscriber_count == 2


def test_permissive_parse_corrupt_file(spark, tmp_path):
    root = str(tmp_path / "raw")
    d = date_path(root, DAY)
    import os

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "channels_bad.json"), "w") as f:
        f.write("{not valid json")
    staged = read_json_array_files(
        spark, date_path(root, DAY) + "/*", schemas.CHANNEL_SCHEMA
    )
    # corrupt file → from_json yields null array → explode drops it; job
    # survives (the reference's swallow-and-continue posture, YC:34-36)
    assert staged.count() == 0
