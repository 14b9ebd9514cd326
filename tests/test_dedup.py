"""Dedup family: LSH candidates vs exact Jaccard ground truth, shingling
edge cases, SimHash determinism + Hamming locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.sources import load_table


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_lsh_vs_exact_ground_truth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = _pairs(
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.5)
    )
    lsh = _pairs(
        dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", 3, n_hashes=32, n_bands=8, threshold=0.5
        )
    )
    # verification step guarantees precision = 1 (every LSH pair is a true
    # near-dup); banding may miss pairs (recall < 1)
    assert lsh <= exact
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = df.select(
        dedup.word_shingles(F.split("text", " "), 3).alias("sh")
    ).collect()
    assert out[0].sh == []
    assert out[1].sh == ["a b c", "b c d"]


def test_simhash_deterministic_and_local(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different vocabulary entirely here now"),
        ],
        "id long, text string",
    )
    toks = F.split("text", " ")
    out1 = {r.id: r.h for r in df.select("id", dedup.simhash64(toks).alias("h")).collect()}
    out2 = {r.id: r.h for r in df.select("id", dedup.simhash64(toks).alias("h")).collect()}
    assert out1 == out2  # deterministic
    ham = df.select(
        dedup.hamming64(
            F.lit(out1[1]).cast("long"), F.lit(out1[2]).cast("long")
        ).alias("near"),
        dedup.hamming64(
            F.lit(out1[1]).cast("long"), F.lit(out1[3]).cast("long")
        ).alias("far"),
    ).collect()[0]
    assert ham.near < ham.far  # similar docs → closer fingerprints


def test_exact_dedup_deterministic_winner(spark):
    df = spark.createDataFrame(
        [(1, "x", 5), (1, "x", 3), (2, "y", 1)], "k int, g string, v int"
    )
    out = dedup.exact_dedup(df, ["k"], [F.col("v").asc()])
    assert {(r.k, r.v) for r in out.collect()} == {(1, 3), (2, 1)}
