"""Product-quantization queries (X3 support): codebook compression audit
and ADC approximate search over the embeddings table.

Both are rows-only at the driver gate (k-means codebooks have no DuckDB
twin) — tests/test_pq.py pins the full numpy replica: identical
centroids, codes, per-vector RMSE, and ADC rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup, quantization as pq
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
