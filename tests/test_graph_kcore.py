"""Semantics pins for operators/graph.k_core: hand-computed cores, the
long-path graph whose peel needs MANY rounds (the case the oracle's
bounded unroll cannot represent — the operator must run to true
fixpoint), and the loud non-convergence contract."""

from __future__ import annotations

import pytest

from youtube_etl_project_spark.operators.graph import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_with_tail_peels_to_the_triangle(spark):
    # 1-2-3 triangle, 3-4-5 tail: 2-core is exactly the triangle, each
    # member at degree 2 (the tail peels over two rounds: 5 first, then 4)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {r.id: r.deg_in_core for r in k_core(e, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_long_path_peels_to_empty_over_many_rounds(spark):
    # a 12-node path needs 6 peel rounds for k=2 (two endpoints per
    # round) and ends empty — the adversarial shape a bounded unroll
    # understates; the operator's fixpoint loop must finish it
    e = _edges(spark, [(i, i + 1) for i in range(1, 12)])
    assert k_core(e, 2).count() == 0


def test_k3_keeps_only_the_clique(spark):
    # K4 clique + a pendant: 3-core is the clique at degree 3
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 9)])
    got = {r.id: r.deg_in_core for r in k_core(e, 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_nonconvergence_raises_instead_of_overstating(spark):
    e = _edges(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(e, 2, max_iter=2)
