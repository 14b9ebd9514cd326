"""Record-linkage operator unit tests (operators/linkage.py) on
constructed frames: cross-group-only candidacy, exact per-mille scores,
deterministic tie-breaks, and the mutual-best acceptance flag."""

from __future__ import annotations

from youtube_etl_project_spark.operators import linkage

# groups: g1 = {1, 4, 5}, g2 = {2}, g3 = {3}
# 3-gram shingle sets:
#   1: {abc bcd cde def}   2: {abc bcd cde def}   3: {abc bcd cdx dxy}
#   4: {pqr qrs}           5: {abc bcd cde deg}
_DOCS = [
    (1, "g1", "a b c d e f"),
    (2, "g2", "a b c d e f"),
    (3, "g3", "a b c d x y"),
    (4, "g1", "p q r s"),
    (5, "g1", "a b c d e g"),
]


def _pairs(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, grp string, text string")
    return linkage.cross_group_scored_pairs(
        docs, "doc_id", "text", "grp", shingle_k=3, max_df=None
    )


def test_cross_group_scores(spark):
    got = {
        (r.id_a, r.id_b): (r.score_pm, r.n_inter)
        for r in _pairs(spark).collect()
    }
    assert got == {
        (1, 2): (1000, 4),  # identical sets
        (5, 2): (600, 3),  # 3 / (4+4-3)
        (1, 3): (333, 2),  # 2 / (4+4-2), integer div
        (2, 3): (333, 2),
        (5, 3): (333, 2),
    }
    # within-group near-dups (1 vs 5, both g1) never become candidates
    assert (1, 5) not in got and (5, 1) not in got


def test_mutual_best_flags(spark):
    best = linkage.mutual_best(
        linkage.best_match(_pairs(spark), min_score_pm=100)
    )
    got = {
        r.doc_id: (r.best_match_id, r.score_pm, r.mutual)
        for r in best.collect()
    }
    assert got == {
        1: (2, 1000, 1),  # 1 and 2 pick each other
        2: (1, 1000, 1),
        3: (1, 333, 0),  # tie 1/2/5 at 333 -> lowest cand id; one-sided
        5: (2, 600, 0),  # 5's best is 2, but 2's best is 1
    }
    assert 4 not in got  # no cross-group candidate at all


def test_min_score_floor(spark):
    best = linkage.best_match(_pairs(spark), min_score_pm=500)
    got = {r.doc_id: r.best_match_id for r in best.collect()}
    assert got == {1: 2, 2: 1, 5: 2}  # the 333-scored decisions drop


def test_incremental_equals_full_restriction(spark, sf_dir):
    from pyspark.sql import functions as F

    from youtube_etl_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = linkage.best_match(
        linkage.cross_group_scored_pairs(
            docs, "doc_id", "text", "source", shingle_k=3, max_df=10
        ),
        min_score_pm=100,
    )
    src0 = {r.doc_id for r in docs.filter(F.col("source") == "src0")
            .select("doc_id").collect()}
    want = sorted(
        (r.doc_id, r.best_match_id, r.score_pm, r.n_inter)
        for r in full.collect() if r.doc_id in src0
    )
    inc = linkage.incremental_best_match(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id", "text", "source", shingle_k=3, max_df=10,
        min_score_pm=100,
    )
    got = sorted(
        (r.doc_id, r.best_match_id, r.score_pm, r.n_inter)
        for r in inc.collect()
    )
    assert got == want
