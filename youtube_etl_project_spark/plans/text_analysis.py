"""Text-analysis queries (SURVEY §2b X4) over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.config import LANG_STOPWORDS
from youtube_etl_project_spark.operators import textops
from youtube_etl_project_spark.registry import fixture_path, register
from youtube_etl_project_spark.sources import load_table


@register(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(
                       list_filter(string_split(text, ' '), x -> x <> ''),
                       w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    doc="X4: whitespace token count + BPE-ish subword estimate (ceil(len/4) "
        "per word)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textops.token_count("text").alias("n_tokens"),
        textops.bpe_ish_token_estimate("text").alias("n_bpe_tokens"),
    )


@register(
    "text_quality_score",
    oracle="""
        SELECT doc_id, n_chars, n_tokens,
               n_chars / n_tokens AS avg_token_len,
               n_stop / n_tokens AS stopword_ratio
        FROM (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
                        AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains(['the','a','of','and','to'], x)))
                        AS BIGINT) AS n_stop
            FROM documents
        )
        WHERE n_tokens > 0
    """,
    doc="X4: quality features — length, avg token length, stopword ratio "
        "(cheap web-corpus quality filters)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = textops.quality_features("text")
    return (
        docs.select(
            "doc_id",
            feats["n_chars"].alias("n_chars"),
            feats["n_tokens"].alias("n_tokens"),
            feats["avg_token_len"].alias("avg_token_len"),
            feats["stopword_ratio"].alias("stopword_ratio"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def _langid_oracle() -> str:
    def hits(words: list[str]) -> str:
        arr = ",".join(f"'{w}'" for w in words)
        return (
            "CAST(len(list_filter(string_split(text,' '), "
            f"x -> list_contains([{arr}], x))) AS INTEGER)"
        )

    langs = list(LANG_STOPWORDS)
    score_cols = ",\n".join(
        f"{hits(LANG_STOPWORDS[lang])} AS s_{lang}" for lang in langs
    )
    # fixed preference order on ties = dict order (en > es > de > fr)
    case = f"'{langs[-1]}'"
    for i in range(len(langs) - 2, -1, -1):
        conds = " AND ".join(
            f"s_{langs[i]} >= s_{langs[j]}" for j in range(i + 1, len(langs))
        )
        case = f"CASE WHEN {conds} THEN '{langs[i]}' ELSE {case} END"
    return f"""
        SELECT doc_id, {case} AS lang_guess,
               s_en, s_es, s_de, s_fr
        FROM (SELECT doc_id, {score_cols} FROM documents)
    """


@register(
    "text_langid",
    oracle=_langid_oracle(),
    doc="X4: stopword-hit language-ID heuristic with deterministic argmax",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = textops.tokens("text")
    scores = textops.lang_scores(toks)
    return docs.select(
        "doc_id",
        textops.lang_guess(toks).alias("lang_guess"),
        *[scores[lang].alias(f"s_{lang}") for lang in LANG_STOPWORDS],
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id, sha256(text) AS fp_sha256, md5(text) AS fp_md5
        FROM documents
    """,
    doc="X4: exact-content document fingerprints (sha256/md5 hex)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textops.fingerprint_sha("text").alias("fp_sha256"),
        F.md5("text").alias("fp_md5"),
    )


@register(
    "text_rolling_hash",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        )
        SELECT doc_id,
               list_reduce(
                   list_prepend(
                       0::BIGINT,
                       list_transform(t, tok ->
                           ('0x' || substr(md5(tok), 1, 8))::BIGINT
                           % 2147483647)
                   ),
                   (acc, v) -> (acc * 31 + v) % 2147483647
               ) AS rhash
        FROM toks
    """,
    doc="X4: polynomial rolling hash over tokens (Rabin-Karp) — order-"
        "sensitive content fingerprint. Token values live in the md5 "
        "domain (first 32 bits), so the exact fold is reproduced in "
        "DuckDB (hex-cast + list_reduce) and the fingerprint is "
        "oracle-checked — converted from rows-only in round 4",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textops.rolling_hash("text").alias("rhash")
    )


# The RELEASED tokenizer (functions/bpe_merges_v1.txt): merges trained
# once on the sf0.01 sample and committed as a versioned model artifact
# (tools/build_bpe_artifact.py). Frozen merges make a text's token count
# corpus-independent, which is what gives both BPE queries a TRUE golden
# oracle: tests/fixtures/bpe_token_counts_v1.parquet holds
# (content_md5, n_tokens_bpe) for every fixture text, and DuckDB joins it
# on md5(text).
_BPE_GOLDEN = fixture_path("bpe_token_counts_v1.parquet")


def _released_merges() -> list:
    from youtube_etl_project_spark.functions import bpe

    return bpe.released_merges()


@register(
    "text_token_count_bpe",
    oracle=f"""
        SELECT d.doc_id, g.n_tokens_bpe
        FROM documents d
        JOIN read_parquet('{_BPE_GOLDEN}') g ON md5(d.text) = g.content_md5
    """,
    doc="X4: REAL byte-level BPE token count — the frozen v1 merge table "
        "(trained deterministically, committed like a released tokenizer "
        "vocab; only the merge list broadcasts) applied via an "
        "Arrow-vectorized pandas UDF with an LRU word cache. Oracle = "
        "golden per-text counts joined on md5(text), so the greedy "
        "lowest-rank merge application is hash-checked end-to-end. This "
        "is the count pack_sequences_bpe budgets on, so a 2048-token bin "
        "means 2048 actual tokens",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    counter = bpe.token_count_udf(_released_merges())
    from youtube_etl_project_spark.operators.dedup import spread

    return spread(docs).select(
        "doc_id", counter(F.col("text")).alias("n_tokens_bpe")
    )


@register(
    "pack_sequences_bpe",
    oracle=f"""
        WITH sized AS (
            SELECT d.doc_id, g.n_tokens_bpe
            FROM documents d
            JOIN read_parquet('{_BPE_GOLDEN}') g ON md5(d.text) = g.content_md5
        )
        SELECT doc_id, n_tokens_bpe,
               CAST(FLOOR((SUM(n_tokens_bpe) OVER (
                    ORDER BY n_tokens_bpe DESC, doc_id ASC
                    ROWS UNBOUNDED PRECEDING) - 1) / 2048.0) AS BIGINT)
                   AS bin_id
        FROM sized
    """,
    doc="Sequence packing on REAL BPE token counts (same longest-first "
        "running-sum layout as pack_sequences, budget 2048): token budgets "
        "now mean actual tokenizer output, not whitespace counts. Golden "
        "oracle recomputes the bins from the frozen-tokenizer counts",
)
def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from youtube_etl_project_spark.functions import bpe
    from youtube_etl_project_spark.operators.dedup import spread

    docs = load_table(spark, sf_dir, "documents")
    counter = bpe.token_count_udf(_released_merges())
    sized = spread(docs).select(
        "doc_id", counter(F.col("text")).alias("n_tokens_bpe")
    )
    w = Window.orderBy(
        F.col("n_tokens_bpe").desc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return sized.withColumn("cum", F.sum("n_tokens_bpe").over(w)).select(
        "doc_id",
        "n_tokens_bpe",
        F.floor((F.col("cum") - 1) / 2048).alias("bin_id"),
    )


@register(
    "text_unigram_surprisal",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS tok
            FROM documents
        ), vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY tok
        ), total AS (
            SELECT CAST(SUM(tf) AS BIGINT) AS n FROM vocab
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(LN(CAST(n AS DOUBLE))
                     - CAST(SUM(CAST(ROUND(LN(CAST(tf AS DOUBLE)), 6)
                                     AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*), 4) AS surprisal
        FROM tok JOIN vocab USING (tok), total
        GROUP BY doc_id, n
    """,
    doc="X4: unigram-LM surprisal per document (CCNet-style quality "
        "scoring): mean -ln p(token) under the corpus's own unigram "
        "distribution, computed as ln(N) - mean(ln tf). Plan: explode to "
        "tokens, shuffle-agg the term frequencies, join tokens back to "
        "their tf via the hot/cold frequency split (the 1024 heaviest "
        "vocabulary terms broadcast — Zipf's head never pins a reducer; "
        "the cold tail shuffle-joins with its per-key row count bounded "
        "by the 1025th tf), one final per-doc aggregate. Cross-engine: "
        "each ln(tf) is rounded to "
        "6dp and summed in the exact decimal domain so Spark's partial "
        "aggregation cannot diverge from the oracle's sequential sum; "
        "libm-vs-JVM ln differences die in the rounding.",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.functions.text import tokens
    from youtube_etl_project_spark.operators.skew import hot_cold_split_join
    from youtube_etl_project_spark.registry import cnt

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(cnt("tf"))
    total = vocab.agg(F.sum("tf").cast("long").alias("n"))
    lg = F.round(F.log(F.col("tf").cast("double")), 6).cast("decimal(18,6)")
    return (
        hot_cold_split_join(tok, vocab, key="tok", weight="tf")
        .join(F.broadcast(total))
        .groupBy("doc_id", "n")
        .agg(
            cnt("n_tokens"),
            F.round(
                F.log(F.col("n").cast("double"))
                - F.sum(lg).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("surprisal"),
        )
        .select("doc_id", "n_tokens", "surprisal")
    )
