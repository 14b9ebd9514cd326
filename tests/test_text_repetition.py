"""Repetition-filter semantics on known strings plus degenerate inputs
(0/1/2-token documents must yield no n-gram rows, never throw — Spark's
``sequence(1, k)`` is descending for k < 1, which the builder must guard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.functions.text import tokens
from youtube_etl_project_spark.plans.text_repetition import _ngram_array


def _grams(spark, text, n):
    df = spark.createDataFrame([(text,)], "text string")
    return [
        r.g
        for r in df.select(
            F.explode(_ngram_array(tokens(F.col("text")), n)).alias("g")
        ).collect()
    ]


def test_bigrams_known_string(spark):
    assert _grams(spark, "a b a b c", 2) == ["a b", "b a", "a b", "b c"]


def test_trigrams_known_string(spark):
    assert _grams(spark, "x y z x", 3) == ["x y z", "y z x"]


def test_ngrams_degenerate_inputs(spark):
    for text in ["", "solo", "two words"]:
        assert _grams(spark, text, 3) == []
    assert _grams(spark, "solo", 2) == []
    assert _grams(spark, "  spaced   out ", 2) == ["spaced out"]


def test_top_bigram_fraction_values(spark):
    from youtube_etl_project_spark.registry import load_all_plans

    df = spark.createDataFrame(
        [(1, "a b a b c", 9), (2, "q", 1)],
        "doc_id long, text string, n_chars long",
    )
    df.createOrReplaceTempView("_unused")  # plans read parquet; test the math
    toks = tokens(F.lower(F.col("text")))
    # inline replica of the plan's math on an in-memory frame
    ex = df.select(
        "doc_id", "n_chars", F.explode(_ngram_array(toks, 2)).alias("bigram")
    )
    counts = (
        ex.groupBy("doc_id", "n_chars", "bigram").count().collect()
    )
    top = {
        (r.doc_id, r.bigram): r["count"] for r in counts if r.doc_id == 1
    }
    # 'a b' occurs twice; covers 2*3=6 of 9 chars
    assert top[(1, "a b")] == 2
    assert load_all_plans()["text_top_bigram_fraction"].oracle is not None


def test_budget_sample_rates_sum_to_budget(spark, sf_dir):
    from youtube_etl_project_spark.registry import load_all_plans

    rows = (
        load_all_plans()["corpus_source_budget_sample"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows, "expected one row per source"
    for r in rows:
        assert 0.0 < r.keep_rate <= 1.0
        assert r.n_kept <= r.n_docs
        assert r.chars_kept <= r.chars_total
        # keep-rate 1.0 must keep everything (the >= 1.0 short-circuit)
        if r.keep_rate == 1.0:
            assert r.n_kept == r.n_docs
