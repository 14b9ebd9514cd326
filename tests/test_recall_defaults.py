"""Pin ANN recall@10 ≥ 0.9 at the registered-query default configs,
against exact brute-force ground truth at sf0.1 (the bench scale the
RECALL.md sweep reports). Everything is deterministic — hyperplanes are
seed-derived, k-means seeds are the lowest-id vectors — so these are
fixed values (LSH 0.92, IVF 0.90), not flaky thresholds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity
from youtube_etl_project_spark.sources import load_table

SF01 = "/root/testdata/sf0.1"
K = 10


@pytest.fixture(scope="module")
def topk_inputs(spark):
    emb = load_table(spark, SF01, "embeddings").localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    candidates = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    gt = _sets(similarity.brute_force_topk(queries, candidates, k=K))
    return emb, queries, candidates, gt


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(ann, gt):
    return sum(len(ann.get(q, set()) & s) / len(s) for q, s in gt.items()) / len(gt)


def test_lsh_default_recall_at_10(topk_inputs):
    _, queries, candidates, gt = topk_inputs
    ann = _sets(
        similarity.lsh_topk(
            queries, candidates, dim=64, k=K, n_planes=4, n_tables=16
        )
    )
    assert _recall(ann, gt) >= 0.9


def test_ivf_default_recall_at_10(topk_inputs):
    emb, queries, candidates, gt = topk_inputs
    centroids = similarity.kmeans_centroids(emb, k=8, iters=2)
    ann = _sets(
        similarity.ivf_topk(queries, candidates, centroids, k=K, n_probe=4)
    )
    assert _recall(ann, gt) >= 0.9
