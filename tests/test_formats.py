"""Source/sink format matrix: parquet is the native format; CSV, JSON-lines,
and ORC round-trip through the same DataFrames (the interchange formats an
ETL edge needs). Values must survive the trip exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.sources import load_table


def _sorted_rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "csv")
    cust.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(cust.schema).csv(path)
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    assert _sorted_rows(back, cols) == _sorted_rows(cust, cols)


def test_jsonl_roundtrip_preserves_longs_and_doubles(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "jsonl")
    ev.write.json(path)
    back = spark.read.schema(ev.schema).json(path)
    assert _sorted_rows(back, ev.columns) == _sorted_rows(ev, ev.columns)


def test_orc_roundtrip_with_timestamps(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "orc")
    ev.write.orc(path)
    back = spark.read.orc(path)
    cols = ["event_id", "ts", "event_type"]
    assert _sorted_rows(back, cols) == _sorted_rows(ev, cols)


def test_partitioned_csv_sink_prunes_directories(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "bydate")
    ev.write.partitionBy("day").parquet(path)
    one_day = ev.select("day").distinct().limit(1).collect()[0].day
    pruned = spark.read.parquet(path).filter(F.col("day") == F.lit(one_day))
    expected = ev.filter(F.col("day") == F.lit(one_day)).count()
    assert pruned.count() == expected
