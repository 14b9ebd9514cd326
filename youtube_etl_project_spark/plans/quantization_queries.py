"""Product-quantization queries (X3 support): codebook compression audit
and ADC approximate search over the embeddings table.

The per-call-trained flagships (embed_pq_rmse / adc_topk / rerank_topk)
are rows-only at the driver gate (k-means codebooks have no DuckDB twin)
— tests/test_pq.py pins the full numpy replica: identical centroids,
codes, per-vector RMSE, and ADC rankings.  The serving path under the
RELEASED v1 codebooks (embed_pq_encode_v1 / adc_topk_v1 / rerank_v1) is
fully ORACLE-CHECKED: the frozen codebooks embed as 1e6-grid integer
literals in both engines, so encode, LUT build, ADC scan, shortlist, and
the exact re-rank are all cross-engine-exact bigint arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup, quantization as pq
from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

_M, _DIM, _K, _ITERS = 8, 64, 16, 2
_N_QUERIES, _TOPK = 5, 10


@register(
    "embed_pq_rmse",
    oracle=None,  # k-means codebooks; numpy-exact parity in tests/test_pq.py
    doc="X3 compression audit: product quantization (m=8 subspaces × "
        "k=16 codes over 64 dims → 8 bytes/vector, 32× vs float32) with "
        "per-vector reconstruction RMSE. Training runs all 8 subspaces "
        "in one distributed pass per Lloyd round (grid-snapped integer "
        "means — partial-aggregation-order-proof); encode+reconstruct is "
        "one Arrow matmul batch; only the 8×16×8 codebook tensor reaches "
        "the driver. The PQ complement of embed_quantize_rmse's scalar "
        "int8 audit",
)
def embed_pq_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = dedup.spread(load_table(spark, sf_dir, "embeddings"))
    books = pq.pq_train(emb, "vec_id", "embedding", _M, _DIM, _K, _ITERS)
    return (
        emb.filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.round(pq.pq_rmse_udf(books)(F.col("embedding")), 6).alias(
                "pq_rmse"
            ),
        )
    )


@register(
    "embed_pq_adc_topk",
    oracle=None,  # same hash-free but model-derived path; pinned by test_pq
    doc="X3 ADC search: top-10 neighbours for the 5 lowest-id query "
        "vectors via asymmetric distance — each query becomes an m×k "
        "LUT (model-sized, closure-broadcast), scan cost is a pure "
        "table gather over the 8-byte codes, the float vectors are "
        "never read at query time. (rank, vec_id)-deterministic: ties "
        "break on vec_id. Recall vs exact L2 pinned by tests/test_pq.py",
)
def embed_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = dedup.spread(load_table(spark, sf_dir, "embeddings"))
    books = pq.pq_train(emb, "vec_id", "embedding", _M, _DIM, _K, _ITERS)

    qrows = (
        emb.filter(F.col("embedding").isNotNull())
        .orderBy(F.col("vec_id").asc())
        .limit(_N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [int(r["vec_id"]) for r in qrows]
    luts = np.stack([
        pq.adc_lut(np.asarray(r["embedding"]), books) for r in qrows
    ])

    encoded = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        pq.pq_encode_udf(books)(F.col("embedding")).alias("codes"),
    )
    scored = encoded.select(
        "vec_id",
        F.posexplode(pq.adc_scores_udf(luts)(F.col("codes"))).alias(
            "q_idx", "adist"
        ),
    )
    qmap = F.array(*[F.lit(q) for q in q_ids])
    w = Window.partitionBy("q_idx").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select(
            qmap[F.col("q_idx")].alias("query_id"),
            "rank",
            "vec_id",
            F.round("adist", 6).alias("adist"),
        )
    )


_SHORTLIST = 100


@register(
    "embed_pq_rerank_topk",
    oracle=None,  # model-derived shortlist; recall + parity in tests/test_pq.py
    doc="X3 production ANN pattern: ADC over the 8-byte PQ codes builds "
        "a 100-candidate shortlist per query (scan never touches float "
        "vectors), then EXACT L2 re-ranks just the shortlist to a final "
        "top-10 — recall 0.78 at 5% shortlist on the hardest "
        "(near-random) corpus vs 0.32 for raw ADC (RECALL.md sweep). "
        "The re-rank join moves |queries|·shortlist rows, codegen "
        "aggregate for the exact distance; everything else is the "
        "embed_pq_adc_topk machinery",
)
def embed_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = dedup.spread(load_table(spark, sf_dir, "embeddings"))
    books = pq.pq_train(emb, "vec_id", "embedding", _M, _DIM, _K, _ITERS)
    qrows = (
        emb.filter(F.col("embedding").isNotNull())
        .orderBy(F.col("vec_id").asc())
        .limit(_N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [int(r["vec_id"]) for r in qrows]
    qvecs = [list(map(float, r["embedding"])) for r in qrows]
    luts = np.stack([
        pq.adc_lut(np.asarray(v), books) for v in qvecs
    ])

    encoded = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        pq.pq_encode_udf(books)(F.col("embedding")).alias("codes"),
    )
    scored = encoded.select(
        "vec_id",
        "embedding",
        F.posexplode(pq.adc_scores_udf(luts)(F.col("codes"))).alias(
            "q_idx", "adist"
        ),
    )
    w = Window.partitionBy("q_idx").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    shortlist = scored.withColumn("srank", F.row_number().over(w)).filter(
        F.col("srank") <= _SHORTLIST
    )
    # exact L2 on the shortlist only — codegen zip_with/aggregate fold
    # against the per-query vector literal (model-sized)
    qmap_vec = F.array(*[
        F.array(*[F.lit(c) for c in v]) for v in qvecs
    ])
    qv = F.element_at(qmap_vec, F.col("q_idx") + 1)
    l2 = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            qv,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qmap_id = F.array(*[F.lit(q) for q in q_ids])
    rw = Window.partitionBy("q_idx").orderBy(
        F.col("l2").asc(), F.col("vec_id").asc()
    )
    return (
        shortlist.withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= _TOPK)
        .select(
            qmap_id[F.col("q_idx")].alias("query_id"),
            "rank",
            "vec_id",
            F.round("l2", 6).alias("l2"),
        )
    )


def _pq_v1_codebook_q() -> list[tuple[int, int, int, int]]:
    """Frozen v1 PQ codebooks (functions/pq_codebooks_v1.json) on the
    1e6 integer grid: (sub, code, pos, cbq) rows — ONE list feeds both
    the Spark broadcast table and the oracle's VALUES literal."""
    import json
    import math
    import os

    from youtube_etl_project_spark import functions as _fns

    path = os.path.join(
        os.path.dirname(_fns.__file__), "pq_codebooks_v1.json"
    )
    with open(path) as f:
        cb = json.load(f)["codebooks"]  # m × k × dsub
    return [
        (sub, code, pos, int(math.floor(v * 1_000_000 + 0.5)))
        for sub, codes in enumerate(cb)
        for code, vec in enumerate(codes)
        for pos, v in enumerate(vec)
    ]


_PQ_V1_VALUES = ", ".join(
    f"({s}, {c}, {p}, {q})" for s, c, p, q in _pq_v1_codebook_q()
)
_PQ_DSUB = 8


@register(
    "embed_pq_encode_v1",
    oracle=f"""
        WITH cb(sub, code, pos, cbq) AS (VALUES {_PQ_V1_VALUES}),
        qe AS (
            SELECT vec_id,
                   CAST((u.pos - 1) // {_PQ_DSUB} AS BIGINT) AS sub,
                   (u.pos - 1) % {_PQ_DSUB} AS pos,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), dists AS (
            SELECT qe.vec_id, qe.sub, cb.code,
                   SUM((qe.q - cb.cbq) * (qe.q - cb.cbq)) AS dist
            FROM qe JOIN cb ON cb.sub = qe.sub AND cb.pos = qe.pos
            GROUP BY 1, 2, 3
        )
        SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY dist ASC, code ASC) AS rn
            FROM dists
        ) WHERE rn = 1
    """,
    doc="X3/PQ serving path, ORACLE-CHECKED end-to-end (VERDICT r4 #3): "
        "PQ encoding under the RELEASED v1 codebooks — the frozen m=8 × "
        "k=16 codebooks embed as 1e6-grid integer literals in both "
        "engines, and each subvector's code (squared-L2 argmin with code "
        "tiebreak) is exact bigint arithmetic. Proves the distributed "
        "encode that every ADC/re-rank query builds on; the per-call-"
        "trained flagships (embed_pq_rmse/adc/rerank) stay rows-only by "
        "nature with numpy parity pinned",
)
def embed_pq_encode_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cbdf = spark.createDataFrame(
        _pq_v1_codebook_q(), "sub long, code int, pos int, cbq long"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            (F.col("j") / _PQ_DSUB).cast("long").alias("sub"),
            (F.col("j") % _PQ_DSUB).alias("pos"),
            F.floor(
                F.col("e").cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    diff = F.col("q") - F.col("cbq")
    dists = (
        qe.join(F.broadcast(cbdf), ["sub", "pos"])
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist"), F.asc("code")
    )
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("code").cast("int").alias("code"))
    )


# Shared CTE prefix for the v1 PQ serving oracles: grid-snap every
# embedding, compute every (vec, sub, code) squared distance against the
# frozen codebooks, then derive codes (argmin) and per-query LUTs (the
# SAME dists rows restricted to the query vectors) from one relation.
_PQ_V1_BASE_CTES = f"""
        WITH cb(sub, code, pos, cbq) AS (VALUES {{values}}),
        qe AS (
            SELECT vec_id,
                   CAST((u.pos - 1) // {_PQ_DSUB} AS BIGINT) AS sub,
                   (u.pos - 1) % {_PQ_DSUB} AS pos,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), dists AS (
            SELECT qe.vec_id, qe.sub, cb.code,
                   CAST(SUM((qe.q - cb.cbq) * (qe.q - cb.cbq))
                        AS BIGINT) AS dist
            FROM qe JOIN cb ON cb.sub = qe.sub AND cb.pos = qe.pos
            GROUP BY 1, 2, 3
        ), codes AS (
            SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                          ORDER BY dist ASC, code ASC)
                           AS rn
                FROM dists
            ) WHERE rn = 1
        ), lut AS (
            SELECT vec_id AS query_id, sub, code, dist
            FROM dists WHERE vec_id < {{nq}}
        ), adc AS (
            SELECT l.query_id, c.vec_id AS neighbor_id,
                   CAST(SUM(l.dist) AS BIGINT) AS adist
            FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
            WHERE l.query_id <> c.vec_id
            GROUP BY 1, 2
        )"""


def _pq_v1_spark_parts(spark: SparkSession, sf_dir: str):
    """Spark mirror of ``_PQ_V1_BASE_CTES``: returns (qe, codes, lut, adc)
    DataFrames, all exact-bigint.  ``dists`` feeds both codes and lut, so
    it is pinned once (CLAUDE.md: multi-referenced derived frames)."""
    cbdf = spark.createDataFrame(
        _pq_v1_codebook_q(), "sub long, code int, pos int, cbq long"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            (F.col("j") / _PQ_DSUB).cast("long").alias("sub"),
            (F.col("j") % _PQ_DSUB).alias("pos"),
            F.floor(
                F.col("e").cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    diff = F.col("q") - F.col("cbq")
    dists = pin(
        qe.join(F.broadcast(cbdf), ["sub", "pos"])
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(diff * diff).cast("long").alias("dist"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist"), F.asc("code")
    )
    codes = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    lut = dists.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", "code", "dist"
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").cast("long").alias("adist"))
    )
    return qe, codes, lut, adc


@register(
    "embed_pq_adc_topk_v1",
    oracle=_PQ_V1_BASE_CTES.format(values=_PQ_V1_VALUES, nq=_N_QUERIES)
    + f"""
        SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, adist
        FROM (
            SELECT query_id, neighbor_id, adist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adist ASC,
                                               neighbor_id ASC) AS rnk
            FROM adc
        ) WHERE rnk <= {_TOPK}
    """,
    doc="X3/PQ serving path, ORACLE-CHECKED end-to-end (VERDICT r4 #3, "
        "completing the embed_pq_encode_v1 story): asymmetric-distance "
        "top-10 under the RELEASED v1 codebooks. The per-query LUT is "
        "literally the dists relation restricted to the query vectors "
        "(build once, reuse for codes AND LUTs), the scan is a "
        "broadcast-LUT gather over the codes, and every distance is "
        "exact bigint arithmetic on the 1e6 grid — so the full "
        "encode->LUT->ADC->rank pipeline hash-matches DuckDB. The "
        "per-call-trained flagship (embed_pq_adc_topk) stays rows-only "
        "with numpy parity pinned",
)
def embed_pq_adc_topk_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, _, adc = _pq_v1_spark_parts(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rank"),
            "adist",
        )
    )


_RERANK_SHORTLIST = 50


@register(
    "embed_pq_rerank_v1",
    oracle=_PQ_V1_BASE_CTES.format(values=_PQ_V1_VALUES, nq=_N_QUERIES)
    + f""", shortlist AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY adist ASC,
                                                   neighbor_id ASC) AS rnk
                FROM adc
            ) WHERE rnk <= {_RERANK_SHORTLIST}
        ), exact AS (
            SELECT s.query_id, s.neighbor_id,
                   CAST(SUM((qa.q - qb.q) * (qa.q - qb.q))
                        AS BIGINT) AS d2
            FROM shortlist s
            JOIN qe qa ON qa.vec_id = s.query_id
            JOIN qe qb ON qb.vec_id = s.neighbor_id
                      AND qb.sub = qa.sub AND qb.pos = qa.pos
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, d2
        FROM (
            SELECT query_id, neighbor_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY d2 ASC,
                                               neighbor_id ASC) AS rnk
            FROM exact
        ) WHERE rnk <= {_TOPK}
    """,
    doc="X3 production ANN pattern, ORACLE-CHECKED end-to-end: ADC over "
        "the v1 codes builds a 50-candidate shortlist per query (the "
        "scan never touches the float vectors), then EXACT quantized L2 "
        "re-ranks just the shortlist to the final top-10 — the "
        "embed_pq_rerank_topk shape with every stage (encode, LUT, ADC, "
        "shortlist, exact re-rank, rank) in exact bigint arithmetic "
        "shared with DuckDB. The re-rank join moves |queries|*shortlist "
        "rows; everything corpus-sized is one broadcast-LUT pass",
)
def embed_pq_rerank_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    qe, _, _, adc = _pq_v1_spark_parts(spark, sf_dir)
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    shortlist = (
        adc.withColumn("rnk", F.row_number().over(ws))
        .filter(F.col("rnk") <= _RERANK_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qa = qe.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", "pos",
        F.col("q").alias("qa"),
    )
    qb = qe.select(
        F.col("vec_id").alias("neighbor_id"), "sub", "pos",
        F.col("q").alias("qb"),
    )
    d = F.col("qa") - F.col("qb")
    exact = (
        shortlist.join(F.broadcast(qa), "query_id")
        .join(qb, ["neighbor_id", "sub", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(d * d).cast("long").alias("d2"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rank"),
            "d2",
        )
    )
