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


def test_integer_geometry_twin():
    """The embed_ivf_ann oracle derives (K, n_probe) with pure-integer
    rules (smallest power of two with K*K*125 >= 4n; n_probe =
    min(K, 1 + ceil(11(K-1)/21))) — they must equal auto_ivf_geometry's
    float rule everywhere the float rule is defined, or the trained-IVF
    gate row would diverge on a fixture-size change."""
    for n in [*range(1, 2000), 4999, 5000, 5001, 31250, 50000, 123456,
              10**6, 10**7, 10**8, 10**9]:
        k_f, np_f = similarity.auto_ivf_geometry(n)
        p = 4
        while p * p * 125 < 4 * n and p < 4096:
            p *= 2
        np_i = min(p, 1 + (11 * (p - 1) + 20) // 21)
        assert (k_f, np_f) == (p, np_i), n


def test_exact_ivf_recall_floor(spark, sf_dir):
    """The converted (oracle-gated) embed_ivf_ann still recalls: its
    quantized-MIPS top-5 against exact brute-force cosine top-5."""
    from youtube_etl_project_spark.registry import load_all_plans

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in load_all_plans()["embed_ivf_ann"].fn(spark, sf_dir).collect()
    }
    assert len(got & exact) / len(exact) >= 0.5
