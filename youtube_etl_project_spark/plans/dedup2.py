"""Dedup wave 2: exact-substring (k-token span) duplication detection and
SemDeDup-style semantic dedup — the two corpus-cleaning modes the wave-1
stack (MinHash/SimHash/Jaccard/embedding-cosine) does not cover.

Exact-substring dedup is the Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better") observation that verbatim *spans* repeat
across web documents even when whole documents don't; the scalable
approximation here detects every duplicated k-token window via hashing
rather than suffix arrays (which don't distribute)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

_K = 16  # span width in tokens


@register(
    "dedup_exact_substring",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), spans AS (
            SELECT doc_id,
                   array_to_string(t[i.i : i.i + {_K} - 1], ' ') AS span
            FROM toks CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(t) - {_K} + 2)) AS i
            ) AS i(i)
            WHERE len(t) >= {_K}
        )
        SELECT span,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM spans
        GROUP BY span
        HAVING COUNT(DISTINCT doc_id) > 1
    """,
    doc=f"X2 exact-substring mode: every {_K}-token window occurring in "
        "more than one document (Lee et al. 2022 span dedup, windowed "
        "approximation of suffix-array matching — windows distribute, "
        "suffix arrays don't). Plan: materialize the token array once, "
        "build all spans per row with one transform(sequence), explode to "
        "a flat span column, aggregate — one shuffle on span. At 100 TB "
        "group on xxhash64(span) instead of the raw text and df_cut "
        "boilerplate spans exactly like hot shingles",
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _K
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {_K} + 1),"
                f" i -> array_join(slice(t, i, {_K}), ' '))"
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            cnt("n_occ"),
        )
        .filter(F.col("n_docs") > 1)
    )


@register(
    "dedup_substring_mask",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), spans AS (
            SELECT doc_id, i.i AS i,
                   array_to_string(t[i.i : i.i + {_K} - 1], ' ') AS span
            FROM toks CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(t) - {_K} + 2)) AS i
            ) AS i(i)
            WHERE len(t) >= {_K}
        ), dup AS (
            SELECT span FROM spans
            GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1
        ), cov AS (
            SELECT DISTINCT s.doc_id, p.p
            FROM spans s JOIN dup USING (span)
            CROSS JOIN LATERAL (
                SELECT unnest(range(s.i, s.i + {_K})) AS p
            ) AS p(p)
        ), nd AS (
            SELECT doc_id, COUNT(*) AS n_dup FROM cov GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.t) AS BIGINT) AS n_tokens,
               ROUND(CAST(COALESCE(nd.n_dup, 0) AS DOUBLE) / len(t.t), 6)
                   AS dup_token_fraction
        FROM toks t LEFT JOIN nd USING (doc_id)
    """,
    doc="The removal signal for exact-substring dedup: per document, the "
        "fraction of token positions covered by the UNION of its "
        f"duplicated {_K}-token spans (overlapping spans counted once — "
        "positions are deduplicated, not span-counted). Three shuffles: "
        "span → dup-span set, span join-back, doc rollup. This is the "
        "column a corpus filter thresholds on (Lee et al. drop/trim "
        "documents whose duplicated-span coverage is high)",
)
def dedup_substring_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    spans = toks.filter(F.size("t") >= _K).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(t) - {_K} + 1),"
                f" i -> array_join(slice(t, i, {_K}), ' '))"
            )
        ).alias("i0", "span"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "span")
    dup = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("span")
    )
    covered = (
        spans.join(dup, "span")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + _K - 1)).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        toks.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.size("t"),
                6,
            ).alias("dup_token_fraction"),
        )
    )


@register(
    "dedup_semantic",
    oracle=None,  # kmeans cells are seed-derived; pair-exactness vs the
    # brute-force same-cell ground truth pinned by tests/test_semantic.py
    doc="X2/X3 composition — SemDeDup (Abbas et al. 2023): k-means "
        "clustering bounds the cosine comparison to within-cell pairs "
        "(Σ|cell|², never n²), connected components collapse near-dup "
        "groups, survivor = min id. The semantic complement to MinHash: "
        "catches paraphrases that share no shingles. Emits "
        "(id, cell, cluster_id, is_kept) for every vector. k scales as "
        "√n (SemDeDup's own regime) so the within-cell join stays "
        "near-linear as the corpus grows — a fixed k would be quadratic "
        "by configuration at 100 TB",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    k = max(16, int(emb.count() ** 0.5))
    return similarity.semantic_dedup(
        emb, "vec_id", "embedding", k=k, threshold=0.4
    )
