"""Mutable-table layer tests: merge join-rewrites, atomic version swap,
partition overwrite, truncate."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.upsert import (
    ParquetTable,
    insert_only_merge,
    merge_upsert,
    overwrite_partitions,
)


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, v int"
    )
    source = spark.createDataFrame(
        [(2, "B", 99), (3, "c", 30)], "k int, name string, v int"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_insert_only_merge_keeps_target(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    source = spark.createDataFrame([(2, 999), (3, 30), (3, 31)], "k int, v int")
    out = {r.k: r.v for r in insert_only_merge(target, source, ["k"]).collect()}
    assert out[1] == 10 and out[2] == 20  # immutable
    assert out[3] in (30, 31)  # new key inserted once (source deduped)
    assert insert_only_merge(target, source, ["k"]).count() == 3


def test_parquet_table_atomic_swap_and_truncate(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    t.write(spark.range(5).withColumn("x", F.lit("a")))
    assert t.read().count() == 5
    v1 = t.current_path()
    t.write(spark.range(3).withColumn("x", F.lit("b")))
    assert t.read().count() == 3
    assert t.current_path() != v1  # new version, old dir gone
    t.truncate()
    assert t.read().count() == 0
    assert t.read().columns == ["id", "x"]  # schema preserved


def test_overwrite_partitions_replaces_only_named(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "agg"))
    t.write(
        spark.createDataFrame(
            [("2024-01-01", "US", 1), ("2024-01-02", "US", 2)],
            "d string, r string, n int",
        )
    )
    fresh = spark.createDataFrame([("2024-01-02", "GB", 99)], "d string, r string, n int")
    overwrite_partitions(t, fresh, "d")
    rows = sorted(map(tuple, t.read().collect()))
    assert rows == [("2024-01-01", "US", 1), ("2024-01-02", "GB", 99)]
