"""Corpus-diagnostics wave: the reports a curation team actually reads —
per-source duplication rates (where is the redundancy coming from?),
leave-one-out 1-NN label accuracy (are the embeddings any good?), and a
Zipf fit over the token distribution (is this natural language?)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

# df-cut twin of corpus_pipeline._PAIRS_CTE (same shape as the
# `dedup_jaccard_dfcut` oracle): shingles appearing in more than 5 documents
# leave the sets before the self-join. This report aggregates over sources,
# so ONE boilerplate-heavy source makes its shingles corpus-hot — the
# unguarded CTE's join is quadratic in exactly the scenario the report
# exists to diagnose.
_PAIRS_DFCUT_CTE = """
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
        FROM toks WHERE len(t) >= 3
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), rare AS (
        SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 5
    ), kept AS (
        SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
    ), pairs AS (
        SELECT id_a, id_b
        FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
"""


@register(
    "dedup_rate_by_source",
    oracle=f"""
        WITH {_PAIRS_DFCUT_CTE.strip()},
        dup AS (
            SELECT id_a AS doc_id FROM pairs
            UNION
            SELECT id_b FROM pairs
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(dup.doc_id) AS BIGINT) AS n_dup,
               ROUND(CAST(COUNT(dup.doc_id) AS DOUBLE) / COUNT(*), 6)
                   AS dup_rate
        FROM documents d LEFT JOIN dup USING (doc_id)
        GROUP BY d.source
    """,
    doc="Duplication diagnostics by source: fraction of each source's "
        "documents participating in at least one near-dup pair — the "
        "report that decides which feed gets its crawler fixed (a "
        "boilerplate-heavy source shows up here before it poisons the "
        "corpus). Pairs come from the df-cut guarded Jaccard (df ≤ 5): a "
        "dominant source's boilerplate shingles are corpus-hot by "
        "definition, so the unguarded self-join is quadratic precisely "
        "when this report matters. Pair ids collapse to a distinct doc "
        "set BEFORE the per-source rollup; the participation join itself "
        "is skew-free (doc_id unique on both sides — hot/cold splitting "
        "doesn't apply, the guard belongs in the pair generator)",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5, max_df=5
    )
    dup = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select("id_b"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.join(dup, "doc_id", "left")
        .groupBy("source")
        .agg(
            cnt("n_docs"),
            F.count("is_dup").cast("long").alias("n_dup"),
            F.round(
                F.count("is_dup").cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "embed_knn_label_accuracy",
    oracle="""
        WITH sims AS (
            SELECT a.vec_id AS i, a.label AS label_i, b.label AS label_j,
                   list_inner_product(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) /
                   (sqrt(list_inner_product(a.embedding::DOUBLE[],
                                            a.embedding::DOUBLE[])) *
                    sqrt(list_inner_product(b.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]))) AS c,
                   b.vec_id AS j
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        ), nn AS (
            SELECT i, label_i, label_j,
                   ROW_NUMBER() OVER (PARTITION BY i
                                      ORDER BY c DESC, j ASC) AS rn
            FROM sims
        )
        SELECT label_i AS label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN label_i = label_j THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               ROUND(CAST(SUM(CASE WHEN label_i = label_j THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS accuracy
        FROM nn WHERE rn = 1
        GROUP BY label_i
    """,
    doc="Embedding-quality eval: leave-one-out 1-NN label prediction "
        "accuracy per class (the fixture's label column as ground truth) "
        "— the sanity metric run before trusting an embedding space for "
        "semantic dedup or retrieval. The n² ranking runs as a blocked "
        "numpy shortlist (nn_shortlist_blocked: per-row candidates within "
        "1e-6 of each block's max — provably contains the exact argmax and "
        "all ties) re-ranked by the exact left-fold cosine, so the result "
        "is bit-identical to the all-pairs plan (96.7s → ~6s at sf0.1). "
        "NULL-embedding rows rank all neighbors by NULL cosine → min id on "
        "both engines (DESC = NULLS LAST in Spark and DuckDB), served by a "
        "broadcast two-smallest-ids side path. At 100 TB the candidate set "
        "comes from the ANN index (embed_lsh_ann/embed_ivf_ann) instead",
)
def embed_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators.similarity import (
        cosine,
        nn_shortlist_blocked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cands = nn_shortlist_blocked(emb, "vec_id", "embedding")
    a = emb.select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("label_i"),
        F.col("embedding").alias("__va"),
    )
    b = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("label_j"),
        F.col("embedding").alias("__vb"),
    )
    sims = cands.join(a, "id").join(b, "cand_id").select(
        "id",
        "cand_id",
        "label_i",
        "label_j",
        cosine(F.col("__va"), F.col("__vb")).alias("c"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("cand_id"))
    nn = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label_i", "label_j")
    )
    # NULL-vector rows: every cosine is NULL, so both engines' rank-1 is
    # simply the smallest other id — join against the two smallest ids
    # (two, in case the smallest IS the null row itself).
    nulls = emb.filter(F.col("embedding").isNull()).select(
        F.col("vec_id").alias("id"), F.col("label").alias("label_i")
    )
    low2 = (
        emb.select(
            F.col("vec_id").alias("cand_id"), F.col("label").alias("label_j")
        )
        .orderBy("cand_id")
        .limit(2)
    )
    wn = Window.partitionBy("id").orderBy(F.asc("cand_id"))
    null_nn = (
        nulls.join(F.broadcast(low2), F.col("cand_id") != F.col("id"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("label_i", "label_j")
    )
    hit = F.when(F.col("label_i") == F.col("label_j"), 1).otherwise(0)
    return nn.union(null_nn).groupBy(F.col("label_i").alias("label")).agg(
        cnt("n"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )


@register(
    "text_zipf_fit",
    oracle="""
        WITH freq AS (
            SELECT t.t AS token, COUNT(*) AS f
            FROM documents CROSS JOIN LATERAL (
                SELECT unnest(string_split(text, ' ')) AS t
            ) AS t(t)
            WHERE t.t <> ''
            GROUP BY t.t
        ), ranked AS (
            SELECT ln(ROW_NUMBER() OVER (ORDER BY f DESC, token ASC)) AS x,
                   ln(CAST(f AS DOUBLE)) AS y
            FROM freq
        ), m AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_tokens,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 4) AS intercept
        FROM m
    """,
    doc="Zipf's-law fit: OLS slope of log-frequency vs log-rank over the "
        "token distribution (natural language ≈ -1; machine-generated or "
        "template text deviates — a corpus-level quality gate). Ranks "
        "are deterministic (freq desc, token asc); the log doubles are "
        "identical on both engines and their moments sum in the decimal "
        "domain; outputs rounded 4 dp to absorb the double→decimal cast "
        "ulp (registry float rules)",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("f"), F.asc("token")))
            .cast("double")
        ).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
        WITH {_PAIRS_DFCUT_CTE.strip()},
        labeled AS (
            SELECT LEAST(da.source, db.source) AS source_a,
                   GREATEST(da.source, db.source) AS source_b
            FROM pairs p
            JOIN documents da ON p.id_a = da.doc_id
            JOIN documents db ON p.id_b = db.doc_id
        )
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM labeled GROUP BY 1, 2
    """,
    doc="Cross-source duplication matrix: near-dup pair counts by "
        "unordered source pair — the 'which feed copies from which' "
        "diagnostic (a crawl duplicating a reference corpus shows up "
        "off-diagonal before either source's own dup_rate looks odd; "
        "dedup_rate_by_source gives the per-source marginal, this gives "
        "the interaction). Pairs come from the same df-cut guarded "
        "Jaccard; the source labels attach via two broadcast-sized "
        "id→source lookups after pair generation, so the matrix rollup "
        "touches |pairs| rows, never the corpus",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5, max_df=5
    )
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
