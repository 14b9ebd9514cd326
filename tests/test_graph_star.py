"""Large-star/small-star connected components (operators/graph.py).

Pins the two properties the min-label variant cannot give:
  * logarithmic convergence on a long path graph (the adversarial case for
    label propagation, whose round count equals the diameter), and
  * identical cluster labels to `connected_components` wherever both run.
Also pins the non-convergence warning ADVICE r1 asked for.
"""

from __future__ import annotations

import warnings

import pytest

from youtube_etl_project_spark.operators import graph


def _star(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = graph.connected_components_star(edges, **kw).collect()
    return {r["id"]: r["cluster_id"] for r in rows}


def test_chain_converges_logarithmically(spark):
    # 10_000-node path: diameter 9_999 — label propagation would need
    # ~10k rounds; large-star/small-star must finish within ~log2(n)+slack.
    n = 10_000
    got = _star(
        spark, [(i, i + 1) for i in range(n - 1)], max_iter=2 * 15 + 4
    )
    assert len(got) == n
    assert set(got.values()) == {0}


def test_matches_label_propagation_on_mixed_graph(spark):
    pairs = (
        [(4, 3), (3, 2), (2, 1)]                       # chain
        + [(10, 11), (11, 12)]                         # second component
        + [(5, i) for i in range(6, 10)]               # star
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]  # clique
        + [(30, 30)]                                   # self loop
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    lp = {
        r["id"]: r["cluster_id"]
        for r in graph.connected_components(edges).collect()
    }
    star = _star(spark, pairs)
    # Self loops carry no connectivity: star drops the node, label prop
    # keeps it as a singleton. Compare on the shared node set.
    assert star == {k: v for k, v in lp.items() if k != 30}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _star(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_label_propagation_warns_on_nonconvergence(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        graph.connected_components(
            edges, max_iter=3, on_nonconverge="warn"
        ).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(edges, max_iter=3, on_nonconverge="raise")


def test_default_escalates_to_star_on_adversarial_chain(spark):
    """Default mode self-heals: a 31-node chain with max_iter=3 cannot
    converge by min-label propagation, so it must escalate to the star
    algorithm and return CORRECT labels with no RuntimeWarning."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(40, 40)], "src long, dst long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = graph.connected_components(edges, max_iter=3).collect()
    assert not any(isinstance(w.message, RuntimeWarning) for w in caught)
    got = {r["id"]: r["cluster_id"] for r in rows}
    # chain fully merged; self-loop node kept as a singleton (the contract)
    assert got == {i: 0 for i in range(31)} | {40: 40}
