"""Mahalanobis outlier scoring: numpy-exact parity with the distributed
moment pass + scoring kernel."""

from __future__ import annotations

import numpy as np
import pytest

from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_mahalanobis_matches_numpy(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter("embedding is not null")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    o = ids.argsort()
    ids = ids[o]
    x = np.stack([np.asarray(rows[i]["embedding"], dtype=np.float64)
                  for i in o])
    n = len(x)
    mu = x.sum(axis=0) / n
    cov = x.T @ x / n - np.outer(mu, mu)
    Ci = np.linalg.inv(cov + 1e-6 * np.eye(x.shape[1]))
    d = x - mu
    scores = ((d @ Ci) * d).sum(axis=1)

    out = load_all_plans()["embed_mahalanobis_outliers"].fn(
        spark, sf_dir
    ).collect()
    assert len(out) == 20
    order = np.lexsort((ids, -np.round(scores, 12)))[:20]
    for r, j in zip(sorted(out, key=lambda r: r["rank"]), order):
        assert r["vec_id"] == int(ids[j])
        assert r["score"] == pytest.approx(round(float(scores[j]), 6),
                                           abs=1e-6)
    # scores are chi2(d)-ish: all positive, top score clearly above median
    assert min(r["score"] for r in out) > 0
