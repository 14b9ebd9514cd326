"""Unit tests for operators/graph.py connected components."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import graph


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = graph.connected_components(edges).collect()
    return {r["id"]: r["cluster_id"] for r in rows}


def test_transitive_chain_collapses(spark):
    # a-b, b-c, c-d: one component rooted at the min id, no a-d edge needed
    got = _cc(spark, [(4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_apart(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 20)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_long_path_converges_within_budget(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}


def test_star_and_clique(spark):
    star = [(5, i) for i in range(6, 10)]
    clique = [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    got = _cc(spark, star + clique)
    assert {got[i] for i in range(5, 10)} == {5}
    assert {got[i] for i in range(20, 24)} == {20}
