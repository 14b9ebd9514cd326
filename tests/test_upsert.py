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


def test_crash_between_write_and_swap(spark, tmp_path, monkeypatch):
    """Kill the writer after the data write but before the pointer swap:
    readers must still see the old version, a re-run must converge, and
    vacuum must reclaim the orphaned directory."""
    import os

    from youtube_etl_project_spark.operators import upsert as upsert_mod

    t = ParquetTable(spark, str(tmp_path / "tbl"))
    t.write(spark.createDataFrame([(1, "old")], "k int, v string"))
    committed = t.current_path()

    real_replace = os.replace

    def crash_on_commit(src, dst, *a, **kw):
        if dst.endswith("_CURRENT"):
            raise OSError("simulated crash before pointer swap")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(upsert_mod.os, "replace", crash_on_commit)
    try:
        t.write(spark.createDataFrame([(2, "new")], "k int, v string"))
        raise AssertionError("write should have crashed at the swap")
    except OSError:
        pass
    monkeypatch.undo()

    # pointer untouched -> readers see the old committed version
    assert t.current_path() == committed
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "old")]
    # the crashed write left a full-but-uncommitted version dir
    orphans = [
        d for d in os.listdir(t.root)
        if d.startswith("v_")
        and os.path.join(t.root, d) != committed
    ]
    assert len(orphans) == 1

    # re-run converges
    t.write(spark.createDataFrame([(2, "new")], "k int, v string"))
    assert [(r.k, r.v) for r in t.read().collect()] == [(2, "new")]

    # vacuum reclaims every non-current dir (the orphan; the pre-crash
    # version was already GC'd inline by the successful write)
    t.vacuum()
    left = [d for d in os.listdir(t.root) if d.startswith("v_")]
    assert os.path.join(t.root, left[0]) == t.current_path()
    assert len(left) == 1
    assert [(r.k, r.v) for r in t.read().collect()] == [(2, "new")]


def test_time_travel_reads_previous_versions(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "tt"), keep_versions=3)
    for i in range(4):
        t.write(spark.range(i, i + 10).toDF("id"))
    # current + two back retained; three back pruned
    assert t.read_version(0).agg({"id": "min"}).collect()[0][0] == 3
    assert t.read_version(1).agg({"id": "min"}).collect()[0][0] == 2
    assert t.read_version(2).agg({"id": "min"}).collect()[0][0] == 1
    assert len(t.history()) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read_version(3)


def test_default_retention_keeps_only_current(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "one"))
    t.write(spark.range(5).toDF("id"))
    t.write(spark.range(7).toDF("id"))
    assert len(t.history()) == 1
    assert t.read().count() == 7
    import os

    dirs = [d for d in os.listdir(t.root) if d.startswith("v_")]
    assert len(dirs) == 1  # old version pruned eagerly


def test_vacuum_respects_retention(spark, tmp_path):
    import os

    t = ParquetTable(spark, str(tmp_path / "vr"), keep_versions=2)
    t.write(spark.range(1).toDF("id"))
    t.write(spark.range(2).toDF("id"))
    # orphan dir (simulated crashed writer) must go; history must stay
    os.makedirs(os.path.join(t.root, "v_orphan"))
    t.vacuum()
    assert not os.path.exists(os.path.join(t.root, "v_orphan"))
    assert len(t.history()) == 2
    assert t.read_version(1).count() == 1
