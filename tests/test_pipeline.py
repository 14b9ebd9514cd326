"""Golden end-to-end pipeline test (SURVEY §5.3): raw JSON → staging →
dedup → merge → aggregate, asserting the reference's semantics —
latest-file-wins, insert-only facts, SCD-lite dim bookkeeping, and
idempotence (running a day twice yields identical tables)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from youtube_etl_project_spark.pipeline import Warehouse, enrich_videos, load_day
from youtube_etl_project_spark.testkit import (
    make_channel,
    make_video,
    write_json_array_file,
)

DAY = date(2024, 3, 2)


@pytest.fixture
def raw_root(tmp_path):
    return str(tmp_path / "raw")


def _seed_day(raw_root: str) -> None:
    videos = [
        make_video("v1", "ch1", category_id=1, title="amazing great stuff"),
        make_video("v2", "ch1", category_id=20, title="whatever"),
        make_video("v2", "ch1", category_id=20, title="whatever"),  # dup id
        make_video("v3", "ch2", category_id=99, view_count=0),  # zero views
        make_video(None, "ch2"),  # null id → filtered
    ]
    channels_old = [
        make_channel("ch1", subscriber_count=100),
        make_channel("ch2", channel_country=None),  # → UNKNOWN
        make_channel(None),  # null id → filtered
    ]
    channels_new = [make_channel("ch1", subscriber_count=999)]  # later file wins
    write_json_array_file(raw_root, DAY, "videos", videos, ts_suffix="20240302_060000")
    write_json_array_file(
        raw_root, DAY, "channels", channels_old, ts_suffix="20240302_060000"
    )
    write_json_array_file(
        raw_root, DAY, "channels", channels_new, ts_suffix="20240302_070000"
    )


def _enriched_records(spark, raw_root):
    _seed_day(raw_root)


def test_load_day_end_to_end(spark, tmp_path, raw_root):
    _seed_day(raw_root)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    counts = load_day(wh, raw_root, DAY)

    # facts: v1, v2 (deduped), v3; null id dropped
    facts = {r.video_id for r in wh.fact_videos.read().collect()}
    assert facts == {"v1", "v2", "v3"}

    # dim: latest file wins for ch1
    dim = {r.channel_id: r for r in wh.dim_channels.read().collect()}
    assert set(dim) == {"ch1", "ch2"}
    assert dim["ch1"].subscriber_count == 999
    assert dim["ch2"].channel_country == "UNKNOWN"
    assert dim["ch1"].first_seen_date is not None

    # staging truncated after load (S9)
    assert counts["staged_videos"] == 5
    assert wh.stg_videos.read().count() == 0


def test_load_day_idempotent(spark, tmp_path, raw_root):
    _seed_day(raw_root)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    load_day(wh, raw_root, DAY)
    first_facts = sorted(
        (r.video_id, r.view_count) for r in wh.fact_videos.read().collect()
    )
    first_agg = sorted(map(tuple, wh.agg_daily.read().drop("avg_engagement_rate").collect()))

    load_day(wh, raw_root, DAY)  # re-run the same day
    second_facts = sorted(
        (r.video_id, r.view_count) for r in wh.fact_videos.read().collect()
    )
    second_agg = sorted(map(tuple, wh.agg_daily.read().drop("avg_engagement_rate").collect()))
    assert first_facts == second_facts  # insert-only merge: no dup inserts
    assert first_agg == second_agg  # replaceWhere refresh: no double counting


def test_dim_scd_update_across_days(spark, tmp_path, raw_root):
    _seed_day(raw_root)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    load_day(wh, raw_root, DAY)
    first_seen = {
        r.channel_id: r.first_seen_date for r in wh.dim_channels.read().collect()
    }

    day2 = date(2024, 3, 3)
    write_json_array_file(
        raw_root, day2, "videos", [make_video("v9", "ch1")],
        ts_suffix="20240303_060000",
    )
    write_json_array_file(
        raw_root, day2, "channels",
        [make_channel("ch1", subscriber_count=5000), make_channel("ch3")],
        ts_suffix="20240303_060000",
    )
    load_day(wh, raw_root, day2)
    dim = {r.channel_id: r for r in wh.dim_channels.read().collect()}
    assert set(dim) == {"ch1", "ch2", "ch3"}
    assert dim["ch1"].subscriber_count == 5000  # updated
    assert dim["ch1"].first_seen_date == first_seen["ch1"]  # preserved
    assert dim["ch3"].first_seen_date is not None  # fresh insert


def test_enrich_videos_matches_reference_semantics(spark):
    raw = spark.createDataFrame(
        [
            ("v1", "ch1", 1, "amazing great", "", [], 100, 10, 5),
            ("v2", "ch1", 19, "whatever", "", [], 0, 0, 0),
        ],
        "video_id string, channel_id string, category_id int, title string, "
        "description string, tags array<string>, view_count long, "
        "like_count long, comment_count long",
    )
    out = {r.video_id: r for r in enrich_videos(raw).collect()}
    assert out["v1"].final_sentiment == "POSITIVE"
    assert out["v1"].classification_method == "KEYWORD_BASED"
    assert out["v1"].engagement_rate == 15.0
    assert out["v2"].final_sentiment == "POSITIVE"
    assert out["v2"].classification_method == "CATEGORY_BASED"
    assert out["v2"].engagement_rate == 0.0


def test_run_day_distributed_sink_end_to_end(spark, tmp_path):
    """run_day's default path: distributed jsonl sink -> splittable staging
    read -> warehouse. No fixture array files, no driver collect."""
    import glob

    from youtube_etl_project_spark.pipeline import run_day
    from youtube_etl_project_spark.testkit import make_channel, make_video

    videos = spark.createDataFrame(
        [
            make_video("v1", "ch1", category_id=1, title="amazing great",
                       tags=["launch"]),
            make_video("v2", "ch2", category_id=20, title="whatever",
                       tags=["misc"]),
        ]
    )
    channels = spark.createDataFrame(
        [make_channel("ch1"), make_channel("ch2", channel_country="GB")]
    )
    raw_root = str(tmp_path / "raw")
    counts = run_day(
        spark, videos, channels, raw_root, str(tmp_path / "wh"), DAY
    )
    assert counts["fact_videos"] == 2
    assert counts["dim_channels"] == 2
    assert counts["agg_daily"] >= 1
    # the sink wrote executor part files under the date path, not a
    # driver-assembled array file
    parts = glob.glob(f"{raw_root}/2024/03/02/videos_spark/part-*")
    assert parts, "expected distributed part files in the raw sink"
    arrays = glob.glob(f"{raw_root}/2024/03/02/*.json")
    assert not arrays, "reference-shaped array fixtures are test-only now"


def test_backfill_skips_done_days_and_resumes(spark, tmp_path, raw_root):
    import os

    from youtube_etl_project_spark.pipeline import backfill

    day2 = date(2024, 3, 3)
    _seed_day(raw_root)
    write_json_array_file(
        raw_root,
        day2,
        "videos",
        [make_video("v9", "ch1", category_id=1)],
        ts_suffix="20240303_060000",
    )
    write_json_array_file(
        raw_root,
        day2,
        "channels",
        [make_channel("ch1")],
        ts_suffix="20240303_060000",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))

    first = backfill(wh, raw_root, [DAY, day2], file_format="array")
    assert set(first) == {DAY.isoformat(), day2.isoformat()}
    n_facts = wh.fact_videos.read().count()

    # Simulate a crash AFTER day 1 committed: delete day2's marker and
    # re-run — only day2 re-loads, and idempotence keeps tables identical.
    os.remove(os.path.join(wh.root, "_backfill", day2.isoformat()))
    second = backfill(wh, raw_root, [DAY, day2], file_format="array")
    assert set(second) == {day2.isoformat()}
    assert wh.fact_videos.read().count() == n_facts

    third = backfill(wh, raw_root, [DAY, day2], file_format="array")
    assert third == {}


def test_backfill_report_after_crash(spark, tmp_path, raw_root, monkeypatch):
    import pytest

    from youtube_etl_project_spark import pipeline
    from youtube_etl_project_spark.pipeline import backfill, backfill_report

    day2 = date(2024, 3, 3)
    day3 = date(2024, 3, 4)
    _seed_day(raw_root)
    write_json_array_file(
        raw_root, day2, "videos",
        [make_video("v9", "ch1", category_id=1)],
        ts_suffix="20240303_060000",
    )
    write_json_array_file(
        raw_root, day2, "channels", [make_channel("ch1")],
        ts_suffix="20240303_060000",
    )
    write_json_array_file(
        raw_root, day3, "videos",
        [make_video("v10", "ch1", category_id=1)],
        ts_suffix="20240304_060000",
    )
    write_json_array_file(
        raw_root, day3, "channels", [make_channel("ch1")],
        ts_suffix="20240304_060000",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    plan = [DAY, day2, day3]

    # Crash while loading day2: day1 commits, day2 records the failure,
    # day3 is never attempted.
    real_load_day = pipeline.load_day

    def exploding(wh_, raw, day, fmt):
        if day == day2:
            raise RuntimeError("executor lost")
        return real_load_day(wh_, raw, day, fmt)

    monkeypatch.setattr(pipeline, "load_day", exploding)
    with pytest.raises(RuntimeError):
        backfill(wh, raw_root, plan, file_format="array")

    rep = backfill_report(wh, plan)
    assert (rep["done"], rep["failed"], rep["pending"]) == (1, 1, 1)
    by_day = {r["day"]: r for r in rep["days"]}
    assert by_day[DAY.isoformat()]["status"] == "done"
    assert by_day[day2.isoformat()]["status"] == "failed"
    assert "executor lost" in by_day[day2.isoformat()]["error"]
    assert by_day[day3.isoformat()]["status"] == "pending"

    # Restart with the bug fixed: the failed day re-runs, its failure
    # marker clears, and the report converges to all-done.
    monkeypatch.setattr(pipeline, "load_day", real_load_day)
    backfill(wh, raw_root, plan, file_format="array")
    rep2 = backfill_report(wh, plan)
    assert (rep2["done"], rep2["failed"], rep2["pending"]) == (3, 0, 0)

    # Marker-dir-only view (days=None) sees the same completed set.
    assert backfill_report(wh)["done"] == 3
