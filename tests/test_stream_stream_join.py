"""Stream-stream interval join: AvailableNow drain of two file-source
streams must produce exactly the batch interval join of the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.streaming.pipeline import interval_joined_streams


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.parquet(v_dir)
    clicks.write.parquet(c_dir)

    sv = spark.readStream.schema(views.schema).parquet(v_dir)
    sc = spark.readStream.schema(clicks.schema).parquet(c_dir)
    out = str(tmp_path / "out")
    q = (
        interval_joined_streams(sv, sc, "user_id", "ts", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    expected = sorted(
        map(
            tuple,
            interval_joined_streams(
                views, clicks, "user_id", "ts", "30 minutes"
            ).collect(),
        )
    )
    assert streamed == expected
    assert len(expected) > 0  # fixture actually exercises the join


def test_stream_stream_outer_join_query_matches_batch(spark):
    """The registered left-outer parity query (flush-sentinel drain) must
    equal the batch LEFT JOIN exactly — including the NULL right_ts rows
    that only exist via watermark state eviction."""
    from youtube_etl_project_spark.registry import load_all_plans

    sf = "/root/testdata/sf0.001"
    plans = load_all_plans()
    streamed = sorted(
        map(tuple, plans["streaming_outer_join_parity"].fn(spark, sf).collect())
    )
    ev = load_table(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    expected = sorted(
        map(
            tuple,
            interval_joined_streams(
                views, clicks, "user_id", "ts", "30 minutes",
                how="left_outer",
            ).collect(),
        )
    )
    assert streamed == expected
    assert any(r[2] is None for r in expected)  # null path exercised


def test_stream_stream_full_outer_join_query_matches_batch(spark):
    """The registered full-outer parity query must equal the batch FULL
    JOIN exactly — including BOTH state-eviction null directions (views
    with no click in-window AND clicks with no view in-window)."""
    from youtube_etl_project_spark.registry import load_all_plans

    sf = "/root/testdata/sf0.001"
    plans = load_all_plans()
    streamed = sorted(
        map(
            tuple,
            plans["streaming_full_outer_join_parity"].fn(spark, sf).collect(),
        ),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    ev = load_table(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    expected = sorted(
        map(
            tuple,
            interval_joined_streams(
                views, clicks, "user_id", "ts", "30 minutes",
                how="full_outer",
            ).collect(),
        ),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    assert streamed == expected
    assert any(r[2] is None for r in expected)  # unmatched-view path
    assert any(r[1] is None for r in expected)  # unmatched-click path


def test_stream_stream_semi_join_query_matches_batch(spark):
    """The registered left-semi parity query must equal the batch LEFT
    SEMI join exactly: one row per view WITH a click in-window (however
    many partners), none for views without — i.e. strictly fewer rows
    than the inner join when multi-matches exist, and a strict subset of
    the views."""
    from youtube_etl_project_spark.registry import load_all_plans

    sf = "/root/testdata/sf0.001"
    plans = load_all_plans()
    streamed = sorted(
        map(tuple, plans["streaming_semi_join_parity"].fn(spark, sf).collect())
    )
    ev = load_table(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    expected = sorted(
        map(
            tuple,
            interval_joined_streams(
                views, clicks, "user_id", "ts", "30 minutes",
                how="left_semi",
            ).collect(),
        )
    )
    assert streamed == expected
    assert 0 < len(expected) < views.count()  # a real filter, not a no-op
    # semi emits one row per view ROW with a partner — count it
    # duplicate-robustly by joining each view row against the distinct
    # matched keys (a distinct-count of inner output would undercount if
    # two identical view rows both match)
    matched_keys = (
        interval_joined_streams(
            views, clicks, "user_id", "ts", "30 minutes", how="inner"
        )
        .select("user_id", "left_ts")
        .distinct()
    )
    per_row = (
        views.select(
            "user_id", F.unix_timestamp("ts").alias("left_ts")
        )
        .join(matched_keys, ["user_id", "left_ts"])
        .count()
    )
    assert len(expected) == per_row
