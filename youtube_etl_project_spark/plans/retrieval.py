"""Keyword retrieval over the documents table: BM25 scoring — the ranking
function behind Lucene/Elasticsearch and the standard lexical half of
retrieval pipelines (dedup audits, decontamination lookups, RAG hybrid
search). Extends the TF-IDF work in plans/advanced2.py to a real ranking
with length normalization.

Scale shape: the exploded token stream filters to the query's terms
BEFORE any shuffle (a handful of terms → the groupBy input is tiny no
matter the corpus), document length is computed without exploding
(``size(split(...))``), and the df/avglen statistics are 1-row/3-row
broadcast dimensions. Nothing in the plan grows with vocabulary size.

Cross-engine float rules (registry docstring): the per-term score terms
are summed in a FIXED textual order (t1 + t2 + t3 — no groupBy-sum over
terms whose reduction order could differ), ln/÷/× are IEEE-identical on
both engines given identical operand order, and the result rounds to 6dp
to absorb representation ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

# Deterministic query: three common engine-vocabulary terms present at
# every scale factor of the generator.
_TERMS = ("join", "hash", "scan")
_K1 = 1.2
_B = 0.75
_TOPK = 50


def _bm25_oracle() -> str:
    score_terms = []
    for t in _TERMS:
        score_terms.append(
            f"""ln(1.0 + (n.n_docs - df_{t} + 0.5) / (df_{t} + 0.5))
                * (tf_{t} * ({_K1} + 1.0))
                / (tf_{t} + {_K1} * (1.0 - {_B} + {_B} * len_d / n.avg_len))"""
        )
    df_cols = ",\n".join(
        f"COUNT(DISTINCT CASE WHEN term = '{t}' THEN doc_id END) AS df_{t}"
        for t in _TERMS
    )
    tf_cols = ",\n".join(
        f"CAST(COUNT(CASE WHEN term = '{t}' THEN 1 END) AS DOUBLE) AS tf_{t}"
        for t in _TERMS
    )
    score = " + ".join(score_terms)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS term
            FROM documents
        ), lens AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS DOUBLE) AS len_d
            FROM documents
        ), hits AS (
            SELECT doc_id, {tf_cols}
            FROM toks WHERE term IN ('{_TERMS[0]}', '{_TERMS[1]}', '{_TERMS[2]}')
            GROUP BY doc_id
        ), stats AS (
            SELECT {df_cols}
            FROM toks WHERE term IN ('{_TERMS[0]}', '{_TERMS[1]}', '{_TERMS[2]}')
        ), n AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(CAST(len_d AS BIGINT)) AS DOUBLE) / COUNT(*)
                       AS avg_len
            FROM lens
        )
        SELECT doc_id, ROUND({score}, 6) AS bm25
        FROM hits
        JOIN lens USING (doc_id)
        CROSS JOIN stats CROSS JOIN n
        ORDER BY ROUND({score}, 6) DESC, doc_id ASC
        LIMIT {_TOPK}
    """


@register(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    doc="Lexical retrieval: BM25 (k1=1.2, b=0.75, Lucene idf form) for a "
        "fixed 3-term query, top-50 by score with doc_id tiebreak. Tokens "
        "filter to the query terms before the per-doc groupBy (the shuffle "
        "input is O(hits), not O(corpus tokens)); doc length avoids the "
        "explode entirely; df/avglen ride along as broadcast 1-row dims. "
        "Per-term score components sum in fixed textual order so both "
        "engines fold identical doubles",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks_arr = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    lens = docs.select(
        "doc_id", F.size(toks_arr).cast("double").alias("len_d")
    )
    hits_src = (
        docs.select("doc_id", F.explode(toks_arr).alias("term"))
        .filter(F.col("term").isin(*_TERMS))
    )
    hits = hits_src.groupBy("doc_id").agg(
        *[
            F.count(F.when(F.col("term") == t, 1)).cast("double").alias(f"tf_{t}")
            for t in _TERMS
        ]
    )
    stats = hits_src.groupBy().agg(
        *[
            F.countDistinct(
                F.when(F.col("term") == t, F.col("doc_id"))
            ).alias(f"df_{t}")
            for t in _TERMS
        ]
    )
    n = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(F.col("len_d").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_len"),
    )
    joined = (
        hits.join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n))
    )
    score = None
    for t in _TERMS:
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
        )
        term = (
            idf
            * (F.col(f"tf_{t}") * (_K1 + 1.0))
            / (
                F.col(f"tf_{t}")
                + _K1 * (1.0 - _B + _B * F.col("len_d") / F.col("avg_len"))
            )
        )
        score = term if score is None else score + term
    return (
        joined.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_TOPK)
    )
