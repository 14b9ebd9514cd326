"""incremental_components(CC(old), new_edges) must equal CC(old ∪ new)
— including cluster merges through a bridging edge, newcomers chained to
each other, and edge-less newcomers as singletons."""

from __future__ import annotations

import random

from youtube_etl_project_spark.operators import graph


def _cc_map(df):
    return {r.id: r.cluster_id for r in df.collect()}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bridge_merges_two_old_clusters(spark):
    old = graph.connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12)]))
    assert set(_cc_map(old).values()) == {1, 10}
    out = _cc_map(
        graph.incremental_components(old, _edges(spark, [(3, 10)]))
    )
    assert out == {n: 1 for n in [1, 2, 3, 10, 11, 12]}


def test_new_chain_and_singleton(spark):
    old = graph.connected_components(_edges(spark, [(1, 2)]))
    new_ids = spark.createDataFrame([(50,), (51,), (52,), (99,)], "doc_id long")
    out = _cc_map(
        graph.incremental_components(
            old, _edges(spark, [(50, 51), (51, 52), (52, 2)]), new_ids=new_ids
        )
    )
    # the chain hangs off cluster 1; 99 is edge-less -> singleton
    assert out == {1: 1, 2: 1, 50: 1, 51: 1, 52: 1, 99: 99}


def test_random_graph_equivalence(spark):
    rng = random.Random(7)
    nodes = list(range(1, 120))
    all_edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(140)
    ]
    all_edges = [(a, b) for a, b in all_edges if a != b]
    cut = int(len(all_edges) * 0.7)
    old_e, new_e = all_edges[:cut], all_edges[cut:]

    old = graph.connected_components(_edges(spark, old_e))
    inc = _cc_map(
        graph.incremental_components(old, _edges(spark, new_e))
    )
    full = _cc_map(graph.connected_components(_edges(spark, all_edges)))
    assert inc == full


def test_intra_cluster_edge_is_noop(spark):
    old = graph.connected_components(_edges(spark, [(1, 2), (2, 3)]))
    out = _cc_map(graph.incremental_components(old, _edges(spark, [(1, 3)])))
    assert out == _cc_map(old)
