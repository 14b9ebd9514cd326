"""plans/exact_linalg — the round-8 exact-grid trainers must be faithful
MODELS, not just deterministic: ridge GD matches the closed form, the
Newton-Schulz inverse matches numpy, subspace-iteration PCA captures the
eigh top-k variance, and tdiv matches DuckDB's `//` (the cross-engine
division every chain relies on). Cross-engine bit-equality itself is the
oracle gate's job (all four promoted queries are value-hash checked)."""

from __future__ import annotations

import numpy as np
import pytest

from youtube_etl_project_spark.plans.exact_linalg import (
    NS_SX,
    PCA_SV,
    RIDGE_S1,
    RIDGE_S2,
    ns_inverse_train,
    pca_subspace_train,
    ridge_gd_train,
    tdiv,
)
from youtube_etl_project_spark.sources import load_table


def test_tdiv_matches_duckdb_intdiv():
    import duckdb

    con = duckdb.connect()
    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (10**25, 7),
             (-(10**25), 7), (1, 10**20)]
    for a, b in cases:
        got = con.execute(
            f"SELECT CAST(CAST('{a}' AS HUGEINT) // CAST('{b}' AS HUGEINT)"
            " AS VARCHAR)"
        ).fetchone()[0]
        assert int(got) == tdiv(a, b), (a, b)


@pytest.fixture(scope="module")
def xy(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter("embedding is not null")
        .select("embedding", "label")
        .collect()
    )
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    y = np.asarray([float(r["label"]) for r in rows])
    return x, y


def test_ridge_gd_matches_closed_form(xy):
    x, y = xy
    n, d = x.shape
    xq = [
        [int(np.floor(v * RIDGE_S1 + 0.5)) for v in row] + [RIDGE_S1]
        for row in x
    ]
    G = [
        [sum(r[i] * r[j] for r in xq) for j in range(d + 1)]
        for i in range(d + 1)
    ]
    b = [sum(r[j] * int(yy) for r, yy in zip(xq, y)) for j in range(d + 1)]
    wq = ridge_gd_train(G, b, n)
    w = np.array(wq, dtype=np.float64) / RIDGE_S2

    xa = np.hstack([x, np.ones((n, 1))])
    w_closed = np.linalg.solve(
        xa.T @ xa + np.eye(d + 1), xa.T @ y
    )
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1 - ((y - xa @ w) ** 2).sum() / sst
    r2c = 1 - ((y - xa @ w_closed) ** 2).sum() / sst
    assert abs(r2 - r2c) < 1e-3, (r2, r2c)


def test_newton_schulz_matches_numpy_inverse(xy):
    x, _ = xy
    n, d = x.shape
    s1 = 1_000
    xq = np.floor(x * s1 + 0.5).astype(int).astype(object)
    Sx = xq.sum(axis=0)
    Cq = (xq.T @ xq) * n - np.outer(Sx, Sx)
    tr = sum(int(Cq[i, i]) for i in range(d))
    epsq = max(1, tdiv(tr, d * 100))
    Aq = [
        [int(Cq[i][j]) + (epsq if i == j else 0) for j in range(d)]
        for i in range(d)
    ]
    sa = n * n * s1 * s1
    X = ns_inverse_train(Aq, sa)
    Xf = np.array(X, dtype=np.float64) / NS_SX
    Ainv = np.linalg.inv(np.array(Aq, dtype=np.float64) / sa)
    rel = np.abs(Xf - Ainv).max() / np.abs(Ainv).max()
    assert rel < 1e-4, rel


def test_pca_subspace_captures_eigh_variance(xy):
    x, _ = xy
    n, d = x.shape
    s1 = 1_000
    k = 16
    xq = np.floor(x * s1 + 0.5).astype(int).astype(object)
    Sx = xq.sum(axis=0)
    Cq = (xq.T @ xq) * n - np.outer(Sx, Sx)
    C = [[int(Cq[i][j]) for j in range(d)] for i in range(d)]
    V = pca_subspace_train(C, k)
    Vf = np.array(V, dtype=np.float64)
    norms = np.linalg.norm(Vf, axis=0)
    assert (norms > 0).all()
    Vf = Vf / norms
    # columns are mutually orthogonal on the integer grid
    assert np.abs(Vf.T @ Vf - np.eye(k)).max() < 1e-4
    Cf = np.array(Cq, dtype=np.float64) / (n * n * s1 * s1)
    evals, evecs = np.linalg.eigh(Cf)
    top = evecs[:, ::-1][:, :k]
    cap = np.trace(Vf.T @ Cf @ Vf) / np.trace(top.T @ Cf @ top)
    assert cap >= 0.9, cap
    # max-abs normalization: every column peaks at exactly PCA_SV
    assert all(
        max(abs(V[i][kk]) for i in range(d)) == PCA_SV for kk in range(k)
    )
