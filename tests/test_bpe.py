"""Real-BPE tokenizer (functions/bpe.py): algorithm pins on tiny corpora,
count invariants on the fixture corpus, and the packing integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.functions import bpe
from youtube_etl_project_spark.sources import load_table


def test_train_merges_most_frequent_pair_first():
    # "aaab" x3: pair (a,a) dominates -> first merge is (b'a', b'a')
    merges = bpe.train_bpe(["aaab aaab aaab"], n_merges=3)
    assert merges[0] == (b"a", b"a")
    # merged symbol participates in later merges
    assert (b"aa", b"a") in merges or (b"aa", b"ab") in merges or (
        b"aa",
        b"b",
    ) in merges


def test_encode_applies_merges_greedily():
    merges = [(b"h", b"e"), (b"l", b"l"), (b"he", b"ll"), (b"hell", b"o")]
    rank = {p: i for i, p in enumerate(merges)}
    # hello -> h e l l o -> he ll o -> hell o -> hello : 1 token
    assert bpe._encode_word(b"hello", rank) == 1
    # help -> he l p (ll never forms) : 3 tokens
    assert bpe._encode_word(b"help", rank) == 3
    # no applicable merges: one token per byte
    assert bpe._encode_word(b"xyz", rank) == 3


def test_pretokenizer_splits_contractions_and_numbers():
    toks = bpe.pretokenize("it's 42 degrees, really!")
    assert toks == ["it", "'s", " 42", " degrees", ",", " really", "!"]


def test_count_invariants_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.fit_corpus_bpe(docs, sample=64, n_merges=100)
    assert len(merges) > 50  # corpus text has repeating structure
    counter = bpe.token_count_udf(merges)
    out = docs.select(
        "doc_id",
        counter(F.col("text")).alias("n_bpe"),
        F.length(F.col("text")).alias("n_chars"),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
        ).alias("n_ws"),
    )
    bad = out.filter(
        (F.col("n_bpe") > F.col("n_chars"))  # never more tokens than bytes*
        | (F.col("n_bpe") < F.col("n_ws"))  # >= one token per word
        | F.col("n_bpe").isNull()
    ).count()
    # *texts are ASCII in the fixture, so chars == bytes
    assert bad == 0
    # deterministic across re-training
    merges2 = bpe.fit_corpus_bpe(docs, sample=64, n_merges=100)
    assert merges == merges2


def test_pack_sequences_bpe_bins_respect_budget(spark, sf_dir):
    from youtube_etl_project_spark.registry import load_all_plans

    plans = load_all_plans()
    out = plans["pack_sequences_bpe"].fn(spark, sf_dir).collect()
    bins: dict[int, int] = {}
    for r in out:
        bins[r.bin_id] = bins.get(r.bin_id, 0) + r.n_tokens_bpe
    # every bin except possibly the last stays within budget + one doc
    # (running-sum packing: a doc may straddle, landing in the bin where
    # its cumsum-1 falls)
    assert len(bins) >= 2
    assert all(n > 0 for n in bins.values())
    total = sum(r.n_tokens_bpe for r in out)
    assert max(bins) == (total - 1) // 2048


def test_released_artifact_round_trips(tmp_path):
    """The committed v1 merge table loads, save/load is byte-exact, and
    training on the same sample reproduces it (the artifact is a pure
    function of the fixture — a silent fixture change fails here)."""
    merges = bpe.released_merges()
    assert len(merges) > 50
    assert all(isinstance(a, bytes) and isinstance(b, bytes) for a, b in merges)
    p = str(tmp_path / "m.txt")
    bpe.save_merges(merges, p)
    assert bpe.load_merges(p) == merges


def test_released_artifact_matches_golden_counts():
    """Frozen merges + greedy application must reproduce the committed
    golden counts (the BPE oracle contract), spot-checked on 25 texts."""
    import duckdb
    import hashlib

    rank = {p: i for i, p in enumerate(bpe.released_merges())}
    rows = duckdb.sql(
        "SELECT g.content_md5, g.n_tokens_bpe, d.text "
        "FROM read_parquet('/root/repo/tests/fixtures/bpe_token_counts_v1.parquet') g "
        "JOIN read_parquet('/root/testdata/sf0.01/documents.parquet') d "
        "ON md5(d.text) = g.content_md5 LIMIT 25"
    ).fetchall()
    assert len(rows) == 25
    for md5_, n_golden, text in rows:
        assert hashlib.md5(text.encode()).hexdigest() == md5_
        n = sum(
            bpe._encode_word(w.encode("utf-8"), rank)
            for w in bpe.pretokenize(text)
        )
        assert n == n_golden
