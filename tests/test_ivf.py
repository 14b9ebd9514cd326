"""IVF coarse quantizer: deterministic training, sane recall vs brute
force, probe-count/recall tradeoff direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity
from youtube_etl_project_spark.sources import load_table


def test_ivf_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=8, iters=2)
    assert len(cents) == 8 and len(cents[0]) == 64
    # deterministic: same seeds + data → same centroids
    cents2 = similarity.kmeans_centroids(emb, k=8, iters=2)
    assert cents == cents2

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }
    ivf3 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(q, c, cents, k=5, n_probe=3).collect()
    }
    ivf_all = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(q, c, cents, k=5, n_probe=8).collect()
    }
    assert len(ivf_all & exact) / len(exact) == 1.0  # all cells = exact
    assert len(ivf3 & exact) / len(exact) >= 0.5
