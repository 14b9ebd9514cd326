"""checkpointing.pin — both modes must return identical results, and
reliable mode must actually write a checkpoint to the configured dir
(the 100 TB survivability path: localCheckpoint blocks die with their
executor; reliable checkpoints re-read from durable storage)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import graph
from youtube_etl_project_spark.operators.checkpointing import ENV_DIR, pin
from youtube_etl_project_spark.operators.ranking import global_rank


@pytest.fixture()
def ckpt_dir(spark, tmp_path, monkeypatch):
    d = str(tmp_path / "ckpt")
    monkeypatch.setenv(ENV_DIR, d)
    yield d
    # the dir sticks on the shared SparkContext, but pin()'s auto mode
    # keys off the env var (restored by monkeypatch), so later tests in
    # the shared session fall back to localCheckpoint


def _files_under(d):
    return [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]


def test_pin_local_mode_default(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    out = pin(df)
    assert out.count() == 100
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_pin_reliable_requires_dir(spark, monkeypatch):
    monkeypatch.delenv(ENV_DIR, raising=False)
    df = spark.range(10)
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint dir"):
            pin(df, reliable=True)


def test_pin_reliable_writes_checkpoint(spark, ckpt_dir):
    df = spark.range(50).withColumn("k", F.md5(F.col("id").cast("string")))
    out = pin(df)  # auto mode: env var set -> reliable
    assert out.count() == 50
    assert _files_under(ckpt_dir), "reliable pin wrote nothing to the dir"


def test_pin_reuses_checkpoint_subdir_per_env_target(spark, ckpt_dir):
    # setCheckpointDir mints a fresh UUID subdirectory per CALL (ADVICE
    # r7): re-applying it on every reliable pin would leak one empty dir
    # per pin in long-lived drivers. Same env target -> the context-level
    # dir is applied once and reused.
    for i in range(3):
        df = spark.range(20 + i)
        assert pin(df).count() == 20 + i
    subdirs = [
        d for d in os.listdir(ckpt_dir)
        if os.path.isdir(os.path.join(ckpt_dir, d))
    ]
    assert len(subdirs) == 1, (
        f"each pin minted its own setCheckpointDir UUID dir: {subdirs}"
    )


def test_global_rank_identical_across_modes(spark, tmp_path, monkeypatch):
    df = spark.range(500).select(
        "id",
        (F.col("id") % 5).alias("v"),
        F.md5(F.col("id").cast("string")).alias("k"),
    )
    order = [F.col("v").desc(), F.col("k").asc()]
    monkeypatch.delenv(ENV_DIR, raising=False)
    local_ranked, n1 = global_rank(df, order, "r", num_partitions=4)
    local_rows = sorted(map(tuple, local_ranked.select("id", "r").collect()))

    monkeypatch.setenv(ENV_DIR, str(tmp_path / "ck2"))
    rel_ranked, n2 = global_rank(df, order, "r", num_partitions=4)
    rel_rows = sorted(map(tuple, rel_ranked.select("id", "r").collect()))
    assert n1 == n2 == 500
    assert local_rows == rel_rows


def test_connected_components_identical_across_modes(spark, tmp_path, monkeypatch):
    # two chains + a singleton-bridge merge; enough rounds to exercise the
    # per-iteration pin path in both modes
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (4, 10), (20, 21)],
        "src long, dst long",
    )
    monkeypatch.delenv(ENV_DIR, raising=False)
    local = sorted(
        map(tuple, graph.connected_components(edges).collect())
    )
    monkeypatch.setenv(ENV_DIR, str(tmp_path / "ck3"))
    rel = sorted(map(tuple, graph.connected_components(edges).collect()))
    assert local == rel
    merged = {cl for _, cl in local}
    assert merged == {1, 20}
