"""Topic clustering: structural and determinism pins for the rows-only
text_topic_clusters query (k-means cells have no SQL oracle)."""

from __future__ import annotations

from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_topic_clusters_structure_and_determinism(spark, sf_dir):
    fn = load_all_plans()["text_topic_clusters"].fn
    rows = fn(spark, sf_dir).collect()
    assert rows

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)

    n_docs_total = sum(
        c[0]["n_docs"] for c in by_cluster.values()
    )
    n_embedded = (
        load_all_plans()["text_hash_embedding"].fn(spark, sf_dir).count()
    )
    assert n_docs_total == n_embedded  # every embedded doc is in a cluster

    for cid, rs in by_cluster.items():
        assert 0 <= cid < 8
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # scores weakly descending with term tiebreak
        for a, b in zip(rs, rs[1:]):
            assert (a["score"], ) >= (b["score"], ) or a["score"] == b["score"]
        for r in rs:
            assert 0 < r["tf"] and 0 < r["df"]

    # deterministic across runs (fixed seeds, no RNG, no collect order dep)
    again = sorted(
        (r["cluster_id"], r["rank"], r["term"], r["score"])
        for r in fn(spark, sf_dir).collect()
    )
    first = sorted(
        (r["cluster_id"], r["rank"], r["term"], r["score"]) for r in rows
    )
    assert again == first
