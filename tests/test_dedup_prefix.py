"""Prefix-filtered set-similarity join (operators/dedup.py:
prefix_filter_jaccard_pairs): completeness vs the all-pairs exact join,
including the exactly-at-threshold boundary the prefix lemma must keep."""

from __future__ import annotations

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.sources import load_table


def _key(rows):
    return sorted((r.id_a, r.id_b, r.jaccard) for r in rows)


def test_prefix_join_equals_exact_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fast = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    )
    assert _key(fast.collect()) == _key(exact.collect())


def test_prefix_join_keeps_threshold_boundary(spark):
    # shingle sets {abc,bcd,cde} vs {bcd,cde,def}: |∩|=2, |∪|=4 —
    # Jaccard exactly 0.5, the boundary the prefix filter must not lose
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "b c d e f"),
            (3, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", shingle_k=3, threshold=0.5
        ).collect()
    }
    assert got == {(1, 2): 0.5}
