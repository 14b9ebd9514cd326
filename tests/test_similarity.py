"""Similarity search: brute-force exactness, LSH recall, self-similarity."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity
from youtube_etl_project_spark.sources import load_table


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<float>")
    row = df.select(similarity.cosine(F.col("v"), F.col("v")).alias("c")).collect()[0]
    assert abs(row.c - 1.0) < 1e-12


def test_brute_force_topk_orders_by_cosine(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),  # closest to 0
            (2, [0.0, 1.0]),  # orthogonal
            (3, [1.0, 0.01]),  # very close
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    out = [
        (r.neighbor_id, r.rank)
        for r in similarity.brute_force_topk(q, c, k=3).orderBy("rank").collect()
    ]
    assert out == [(3, 1), (1, 2), (2, 3)]


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(
            q, c, dim=64, k=5, n_planes=4, n_tables=8
        ).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.5, f"ANN recall collapsed: {recall}"
    # every ANN hit shares the bucket, so results are a subset of candidates
    assert all(pair[0] != pair[1] for pair in ann)


def test_cosine_pairs_lsh_vs_exact(spark, sf_dir):
    from youtube_etl_project_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.cosine_pairs_lsh(emb, threshold=0.4).collect()
    }
    assert lsh <= exact  # verify step -> precision 1.0
    assert exact, "fixture should contain cosine>=0.4 pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"embedding-pair LSH recall collapsed: {recall}"


def test_cosine_pairs_blocked_matches_plain(spark, sf_dir):
    """The blocked-matmul prefilter + exact verify must be bit-identical to
    the pure declarative baseline (values AND pair set), across several
    block sizes so cross-block and within-block paths both execute."""
    emb = load_table(spark, sf_dir, "embeddings")
    plain = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    assert plain
    for block_rows in (64, 10_000):  # many small blocks / one block
        blocked = {
            (r.id_a, r.id_b, r.cosine)
            for r in similarity.cosine_pairs_blocked(
                emb, threshold=0.4, block_rows=block_rows
            ).collect()
        }
        assert blocked == plain, f"block_rows={block_rows}"


def test_cosine_pairs_blocked_edge_vectors(spark):
    """Null vectors drop out of both variants identically; zero-norm
    vectors RAISE in both (ANSI divide-by-zero in the exact cosine — the
    blocked prefilter deliberately keeps non-finite scores so the exact
    path, not numpy, decides them, preserving throw-parity)."""
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 1e-7]),
            (3, None),  # null embedding
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    plain = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(emb, threshold=0.9).collect()
    )
    blocked = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_blocked(
            emb, threshold=0.9, block_rows=2
        ).collect()
    )
    assert blocked == plain == [(0, 1, 1.0)]

    zero = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ArithmeticException):
        similarity.cosine_pairs(zero, threshold=0.9).collect()
    with pytest.raises(ArithmeticException):
        similarity.cosine_pairs_blocked(
            zero, threshold=0.9, block_rows=2
        ).collect()


def test_nn_shortlist_contains_exact_argmax(spark, sf_dir):
    """Every row's true (numpy-exact) 1-NN — and all ties within float
    precision — must appear in the blocked shortlist, at a block size
    small enough to force many cross-block groups."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    nrm = np.sqrt((X * X).sum(axis=1))
    cs = (X @ X.T) / (nrm[:, None] * nrm[None, :])
    np.fill_diagonal(cs, -np.inf)

    short = {}
    for r in similarity.nn_shortlist_blocked(
        emb, "vec_id", "embedding", block_rows=64
    ).collect():
        short.setdefault(r.id, set()).add(r.cand_id)

    for i in range(len(ids)):
        best = cs[i].max()
        tied = set(ids[np.nonzero(cs[i] >= best - 1e-9)[0]])
        assert tied <= short[ids[i]], f"1-NN missing for vec_id={ids[i]}"
