"""Prefix-doubling suffix ranks (plans/suffix_dedup.py): parity with
the windowed ground truth at L=16 (the registered span length) AND
L=32 (a length the registered windowed query never computes — proving
the doubling generalizes), plus segment-shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.plans import suffix_dedup
from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def _windowed_spans(spark, sf_dir, L):
    """Ground truth: materialized L-token window text, grouped."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= L
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {L} + 1),"
                f" i -> array_join(slice(t, i, {L}), ' '))"
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") > 1)
    )


def test_suffix_spans_match_windowed_plan_L16(spark, sf_dir):
    plans = load_all_plans()
    want = {
        (r.span, r.n_docs, r.n_occ)
        for r in plans["dedup_exact_substring"].fn(spark, sf_dir).collect()
    }
    got = {
        (r.span, r.n_docs, r.n_occ)
        for r in plans["dedup_suffix_spans"].fn(spark, sf_dir).collect()
    }
    assert got == want and want


def test_suffix_ranks_generalize_to_L32(spark, sf_dir):
    """At L=32 the windowed plan would shuffle 2x the characters; the
    doubling adds ONE more round. Same duplicated groups either way."""
    L = 32
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= L
    )
    groups, _cov = suffix_dedup.dup_window_starts(toks, L)
    got = {(r.n_docs, r.n_occ) for r in groups.collect()}
    got_n = groups.count()
    want_rows = _windowed_spans(spark, sf_dir, L).collect()
    want = {(r.n_docs, r.n_occ) for r in want_rows}
    assert got_n == len(want_rows)
    assert got == want


def test_suffix_spans_match_windowed_plan_L64(spark, sf_dir):
    """The registered long-span row (round 11): 6 doubling rounds vs
    the ground truth's materialized 64-token window text — the regime
    the module was built for (the windowed plan shuffles ~4x the L=16
    characters here; the doubling adds two rounds of integer ranks)."""
    plans = load_all_plans()
    want = {
        (r.span, r.n_docs, r.n_occ)
        for r in _windowed_spans(spark, sf_dir, 64).collect()
    }
    got = {
        (r.span, r.n_docs, r.n_occ)
        for r in plans["dedup_suffix_spans_64"].fn(spark, sf_dir).collect()
    }
    assert got == want and want


def test_dup_segments_shape(spark, sf_dir):
    """Maximal segments: each is >= L tokens, starts are 1-based and
    in-document, and segments of one doc never overlap (maximality)."""
    rows = (
        load_all_plans()["dedup_dup_segments"].fn(spark, sf_dir).collect()
    )
    assert rows
    lens = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    per_doc: dict = {}
    for r in rows:
        assert r.seg_len >= suffix_dedup._L
        assert 1 <= r.seg_start
        assert r.seg_start + r.seg_len - 1 <= lens[r.doc_id]
        per_doc.setdefault(r.doc_id, []).append((r.seg_start, r.seg_len))
    for segs in per_doc.values():
        segs.sort()
        for (s1, l1), (s2, _l2) in zip(segs, segs[1:]):
            # maximal: next segment starts beyond a gap (> 1 apart in
            # window starts means > seg boundary in tokens)
            assert s2 > s1 + l1 - suffix_dedup._L + 1
