"""Trained Mahalanobis outlier scoring (round 8: exact-grid Newton-Schulz
under the oracle gate): the integer pipeline must agree with a float
reference computed under the SAME shrinkage model — same top-20 ids, and
scores equal after grid descaling up to the Newton-Schulz grid error.
Cross-engine equality is the oracle gate's job; this pins that the
integer model is a faithful Mahalanobis, not a deterministic number
generator."""

from __future__ import annotations

import numpy as np
import pytest

from youtube_etl_project_spark.plans.exact_linalg import tdiv
from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table

S1 = 1_000
SX = 100_000


def test_mahalanobis_matches_float_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter("embedding is not null")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = sorted(r["vec_id"] for r in rows)
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    n = len(ids)
    d = 64
    # exact integer replica of the trainer's inputs
    xq = {
        i: [int(np.floor(float(v) * S1 + 0.5)) for v in emb[i]]
        for i in ids
    }
    Sx = [sum(xq[i][j] for i in ids) for j in range(d)]
    cq = {
        i: [tdiv(n * xq[i][j] - Sx[j], n) for j in range(d)] for i in ids
    }
    # float reference for the INVERSE only (the one step NS approximates)
    X = np.array([xq[i] for i in ids], dtype=np.float64) / S1
    mu = np.array(Sx, dtype=np.float64) / (n * S1)
    cov = X.T @ X / n - np.outer(mu, mu)
    eps = np.trace(cov) / (d * 100)
    Ci = np.linalg.inv(cov + eps * np.eye(d))
    ref = {
        i: float(c @ Ci @ c) / (S1 * S1)
        for i, c in ((i, np.array(cq[i], dtype=np.float64)) for i in ids)
    }

    out = load_all_plans()["embed_mahalanobis_outliers"].fn(
        spark, sf_dir
    ).collect()
    assert len(out) == 20
    top = sorted(ids, key=lambda i: (-round(ref[i], 9), i))[:20]
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == top
    for r in out:
        # score_q sits on the S1^2 * SX grid; NS reaches ~1e-5 relative
        assert r["score_q"] / (S1 * S1 * SX) == pytest.approx(
            ref[r["vec_id"]], rel=2e-4
        )
    assert min(r["score_q"] for r in out) > 0
