"""Repetition-based quality filters and corpus mix sampling (SURVEY §2b X4).

Gopher-style repetition signals (Rae et al. 2021 §A1.1: "fraction of
characters in the most common n-gram", "fraction of characters in
duplicated n-grams") over the ``documents`` table, plus a deterministic
per-source token-budget rebalancing sampler — the "data mixing" step of a
training-corpus pipeline.

Scale notes: both repetition queries are explode → flat columns →
aggregate (no nested higher-order folds re-referenced); the n-gram key
space is per-document, so the groupBy key (doc_id, ngram) is near-unique
and cannot hot-spot a reducer. The mix sampler is two aggregates joined
back via a broadcast model-size table (one row per source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.functions.text import tokens
from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


def _ngram_array(toks, n: int):
    """array<string> of space-joined word n-grams; empty when < n tokens.

    Built with 1-based ``element_at`` over ``sequence(1, size-n+1)``;
    guarded by CASE because Spark's ``sequence(1, k)`` is *descending* for
    k < 1 (it would fabricate indices, not return empty).

    ``toks`` MUST be a materialized column reference, not the tokenizer
    expression itself: codegen re-evaluates an expression argument inside
    every ``element_at`` lambda call, so passing ``split(...)`` directly
    costs O(n_tokens) split() evaluations per row — measured 20x (12.9s →
    0.65s at sf0.1) against projecting the array first. ``_exploded``
    below does it right.
    """
    k = F.size(toks) - (n - 1)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), gram)).otherwise(
        F.array().cast("array<string>")
    )


def _exploded(docs: DataFrame, n: int, alias: str, *carry: str) -> DataFrame:
    """(doc_id, *carry, <alias>=exploded word n-gram) — the token array is
    projected to a named column first (see ``_ngram_array``'s codegen
    note), then exploded flat before aggregation."""
    toks = tokens(F.lower(F.col("text")))
    return docs.select("doc_id", *carry, toks.alias("__toks")).select(
        "doc_id", *carry, F.explode(_ngram_array(F.col("__toks"), n)).alias(alias)
    )


@register(
    "text_top_bigram_fraction",
    oracle="""
        WITH tok AS (
            SELECT doc_id, n_chars,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS l
            FROM documents
        ), bi AS (
            SELECT doc_id, n_chars,
                   unnest(list_transform(range(1, len(l)),
                                         i -> l[i] || ' ' || l[i+1])) AS bigram
            FROM tok
        ), counts AS (
            SELECT doc_id, n_chars, bigram,
                   CAST(COUNT(*) AS BIGINT) AS bigram_count
            FROM bi GROUP BY doc_id, n_chars, bigram
        )
        SELECT doc_id, bigram AS top_bigram, bigram_count,
               ROUND(bigram_count * length(bigram)
                     / CAST(n_chars AS DOUBLE), 6) AS char_fraction
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY bigram_count DESC, bigram ASC) AS rn
            FROM counts
        ) WHERE rn = 1
    """,
    doc="X4 quality filter (Gopher 'fraction of characters in the most "
        "common 2-gram'): per document, the most frequent word bigram and "
        "the share of the document's characters it accounts for — high "
        "values flag boilerplate/spam. Deterministic argmax via "
        "(count DESC, bigram ASC) tiebreak. Plan: bigrams as a flat "
        "explode, count, per-doc window top-1; the window partitions on "
        "doc_id so it re-uses the groupBy's hash partitioning.",
)
def text_top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = _exploded(docs, 2, "bigram", "n_chars")
    counts = ex.groupBy("doc_id", "n_chars", "bigram").agg(cnt("bigram_count"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("bigram_count").desc(), F.col("bigram").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            "bigram_count",
            F.round(
                F.col("bigram_count")
                * F.length("bigram")
                / F.col("n_chars").cast("double"),
                6,
            ).alias("char_fraction"),
        )
    )


@register(
    "text_dup_trigram_fraction",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS l
            FROM documents
        ), tri AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(l) - 1),
                          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))
                       AS trigram
            FROM tok
        ), counts AS (
            SELECT doc_id, trigram, CAST(COUNT(*) AS BIGINT) AS c
            FROM tri GROUP BY doc_id, trigram
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_trigrams,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS dup_trigrams,
               ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                     / CAST(SUM(c) AS BIGINT), 6) AS dup_fraction
        FROM counts GROUP BY doc_id
    """,
    doc="X4 quality filter (Gopher 'fraction of characters in duplicated "
        "n-grams', word-trigram variant): per document, the share of "
        "trigram occurrences whose trigram appears more than once — the "
        "strongest single repetition signal for machine-generated/looped "
        "text. Two aggregations, both keyed (doc_id[, trigram]), so the "
        "second agg is a near-free re-shuffle of pre-combined partials.",
)
def text_dup_trigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = _exploded(docs, 3, "trigram")
    counts = ex.groupBy("doc_id", "trigram").agg(cnt("c"))
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("long")
    tot = F.sum("c").cast("long")
    return counts.groupBy("doc_id").agg(
        tot.alias("n_trigrams"),
        dup.alias("dup_trigrams"),
        F.round(dup / tot, 6).alias("dup_fraction"),
    )


@register(
    "corpus_source_budget_sample",
    oracle="""
        WITH stats AS (
            SELECT source,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_src
            FROM documents GROUP BY source
        ), tot AS (
            SELECT CAST(SUM(chars_src) AS BIGINT) AS chars_all,
                   CAST(COUNT(*) AS BIGINT) AS n_src
            FROM stats
        ), rated AS (
            SELECT source,
                   LEAST(1.0, (chars_all / CAST(n_src AS DOUBLE)) / chars_src)
                       AS rate
            FROM stats, tot
        ), flagged AS (
            SELECT d.source, d.n_chars, r.rate,
                   (r.rate >= 1.0
                    OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                       < printf('%08x',
                                CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT)))
                       AS keep
            FROM documents d JOIN rated r USING (source)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total,
               CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
                   AS chars_kept,
               ROUND(MIN(rate), 6) AS keep_rate
        FROM flagged GROUP BY source
    """,
    doc="Corpus mix rebalancing (the 'data mixing' step of a training "
        "pipeline): downsample each source toward an equal character "
        "budget, keep-rate = min(1, (total/n_sources)/source_total), "
        "selection by md5-prefix threshold — deterministic across engines, "
        "runs, and partitionings, no RNG state shipped to executors. "
        "Plan: one aggregate builds the per-source rate table (model-"
        "sized), broadcast back onto the fact scan; the keep decision is "
        "map-side, so the only shuffles are the two keyed aggregates. The "
        "rate->threshold compare stays in the hex-string domain "
        "(printf('%08x')) to avoid engine-specific hex-to-int casts.",
)
def corpus_source_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars_src")
    )
    tot = stats.agg(
        F.sum("chars_src").cast("long").alias("chars_all"),
        F.count(F.lit(1)).cast("long").alias("n_src"),
    )
    rated = stats.join(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("chars_all") / F.col("n_src").cast("double"))
            / F.col("chars_src"),
        ).alias("rate"),
    )
    thr_hex = F.format_string(
        "%08x", F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")
    )
    keep = (F.col("rate") >= 1.0) | (
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
        )
        < thr_hex
    )
    return (
        docs.join(F.broadcast(rated), "source")
        .withColumn("keep", keep)
        .groupBy("source")
        .agg(
            cnt("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_kept"),
            F.round(F.min("rate"), 6).alias("keep_rate"),
        )
    )
