"""Compaction + sorted rewrite: fewer files, same rows, atomic."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.maintenance import (
    compact,
    data_file_count,
    sorted_rewrite,
)
from youtube_etl_project_spark.operators.upsert import ParquetTable
from youtube_etl_project_spark.sources import load_table


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    li = load_table(spark, sf_dir, "lineitem").repartition(24)  # fragment
    t.write(li)
    assert data_file_count(t) >= 24
    before = t.read().count()
    n_files = compact(t)
    assert n_files < 24
    assert t.read().count() == before


def test_sorted_rewrite_orders_within_partitions(spark, sf_dir, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.write(load_table(spark, sf_dir, "orders"))
    sorted_rewrite(t, "o_orderkey", partitions=4)
    # rows unchanged; each file internally sorted (spot-check via per-file
    # min/max non-overlap after range partitioning)
    df = t.read()
    assert df.count() == 1500
    per_file = (
        df.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # range partitions don't overlap


def test_zorder_rewrite_prunes_both_dims_and_stays_atomic(
    spark, sf_dir, tmp_path
):
    from youtube_etl_project_spark.operators.layout import (
        file_stats,
        overlap_fraction,
    )
    from youtube_etl_project_spark.operators.maintenance import zorder_rewrite

    # decorrelated 2-d grid (same construction as tests/test_layout.py)
    rows = [(i, i % 64, (i * 2654435761) % 4294967296 % 64)
            for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, a long, b long")

    t = ParquetTable(spark, str(tmp_path / "t"), keep_versions=3)
    t.write(df)
    sorted_rewrite(t, "a", partitions=16)
    v_sorted = t.read()
    box = {"a": (16, 31), "b": (16, 31)}
    lin_frac = overlap_fraction(file_stats(v_sorted, ["a", "b"]), box)

    zorder_rewrite(t, "a", "b", partitions=16, bits=6)
    cur = t.read()
    assert cur.count() == 4096
    assert cur.agg(F.sum("id")).first()[0] == sum(r[0] for r in rows)
    z_frac = overlap_fraction(file_stats(cur, ["a", "b"]), box)
    assert z_frac <= 0.5 * lin_frac, (z_frac, lin_frac)

    # atomicity: the pre-rewrite version is still readable via time travel
    hist = t.history()
    assert len(hist) >= 2
    prev = t.read_version(len(hist) - 2)
    assert prev.count() == 4096
