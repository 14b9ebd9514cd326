"""Semantics pins for incremental view maintenance (operators/mv.py):
the oracle gate proves incremental == full rebuild on the fixture; these
pin the edge semantics the fixture doesn't exercise — new keys, deleted
keys, untouched-row passthrough."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.mv import (
    additive_merge,
    scoped_refresh,
)


def _view(spark, rows):
    df = spark.createDataFrame(rows, "k long, n long, s_raw string")
    return df.select(
        "k", "n", F.col("s_raw").cast("decimal(28,4)").alias("s")
    )


_MEASURES = {"n": None, "s": None}  # zeros built in the test (need F)


def _measures():
    return {
        "n": F.lit(0).cast("long"),
        "s": F.lit(0).cast("decimal(28,4)"),
    }


def test_additive_merge_new_untouched_and_merged_keys(spark):
    old = _view(spark, [(1, 2, "10.5"), (2, 1, "3.25")])
    delta = _view(spark, [(2, 3, "0.75"), (3, 1, "7.0")])
    got = {
        r.k: (r.n, r.s)
        for r in additive_merge(old, delta, ["k"], _measures()).collect()
    }
    assert got[1] == (2, Decimal("10.5000"))  # untouched: bit-identical
    assert got[2] == (4, Decimal("4.0000"))  # merged: both sides summed
    assert got[3] == (1, Decimal("7.0000"))  # new key appears
    assert set(got) == {1, 2, 3}


def test_scoped_refresh_updates_deletes_and_keeps(spark):
    old = _view(spark, [(1, 2, "10.5"), (2, 1, "3.25"), (3, 4, "9.0")])
    # delta touches keys 2 (update) and 3 (all rows deleted)
    affected = spark.createDataFrame([(2,), (3,)], "k long")

    def recompute(keyset):
        # current truth for the affected keys: key 2 now (5, 1.0);
        # key 3 has no surviving rows -> absent from the recompute
        cur = _view(spark, [(2, 5, "1.0")])
        return cur.join(keyset, "k", "left_semi")

    got = {
        r.k: (r.n, r.s)
        for r in scoped_refresh(old, affected, recompute, ["k"]).collect()
    }
    assert got[1] == (2, Decimal("10.5000"))  # untouched survives
    assert got[2] == (5, Decimal("1.0000"))  # stale row replaced
    assert 3 not in got  # deleted key dropped, stale row cannot survive
