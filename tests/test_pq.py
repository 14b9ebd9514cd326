"""Product quantization: numpy-exact parity of the distributed trainer,
encoder, RMSE and ADC search (the pinning tests that stand in for the
DuckDB oracle these model-derived queries can't have)."""

from __future__ import annotations

import numpy as np
import pytest

from youtube_etl_project_spark.operators import quantization as pq
from youtube_etl_project_spark.sources import load_table

M, DIM, K, ITERS = 8, 64, 16, 2
GRID = 1e9


def _load_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter("embedding is not null")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = ids.argsort()
    x = np.stack([np.asarray(rows[i]["embedding"], dtype=np.float64)
                  for i in order])
    return ids[order], x


def _np_train(x: np.ndarray) -> np.ndarray:
    """Driver-side replica of pq_train: same seeds, same snapped means."""
    dsub = DIM // M
    xs = x.reshape(len(x), M, dsub)
    books = np.transpose(xs[:K], (1, 0, 2)).copy()  # m × k × dsub
    for _ in range(ITERS):
        fresh = books.copy()
        for s in range(M):
            c2 = (books[s] * books[s]).sum(axis=1)
            d = -2.0 * (xs[:, s, :] @ books[s].T) + c2
            cells = d.argmin(axis=1)
            for c in np.unique(cells):
                pts = xs[cells == c, s, :]
                snapped = np.floor(pts * GRID + 0.5)
                fresh[s, c] = snapped.sum(axis=0) / GRID / len(pts)
        books = fresh
    return books


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.pq_train(emb, "vec_id", "embedding", M, DIM, K, ITERS)
    ids, x = _load_np(spark, sf_dir)
    return emb, books, ids, x


def test_codebooks_match_numpy_replica(trained):
    _, books, _, x = trained
    np.testing.assert_array_equal(books, _np_train(x))


def _np_train_exact(ids: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Integer replica of pq_train_exact: same grid snap, same id-rank
    seeds, same exact argmin and snapped means — int64 end to end."""
    import math

    dsub = DIM // M
    q = np.floor(x * 1e6 + 0.5).astype(np.int64).reshape(len(x), M, dsub)
    books = np.transpose(q[:K], (1, 0, 2)).copy()  # m x k x dsub (int64)
    for _ in range(ITERS):
        fresh = books.copy()
        for s in range(M):
            d = ((q[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            cells = d.argmin(axis=1)  # first (lowest) index on ties
            for c in np.unique(cells):
                pts = q[cells == c, s, :]
                fresh[s, c] = np.array(
                    [
                        math.floor(int(col.sum()) / len(pts) + 0.5)
                        for col in pts.T
                    ],
                    dtype=np.int64,
                )
            books = books  # previous centroids kept for empty cells
        books = fresh
    return books


def test_exact_trainer_matches_integer_replica(spark, sf_dir):
    """pq_train_exact (the oracle-checked trainer behind the converted
    embed_pq_* flagships) == a driver-side int64 replica."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.pq_train_exact(emb, "vec_id", "embedding", M, DIM, K, ITERS)
    ids, x = _load_np(spark, sf_dir)
    expect = _np_train_exact(ids, x)
    got = np.zeros_like(expect)
    for (s, c, p), cq in books.items():
        got[s, c, p] = cq
    np.testing.assert_array_equal(got, expect)


def _exact_parts_np(ids, x):
    """Codes + per-vector SSE + ADC distances under the exact trainer —
    the numpy ground truth the quality floors below score against."""
    dsub = DIM // M
    books = _np_train_exact(ids, x)
    q = np.floor(x * 1e6 + 0.5).astype(np.int64).reshape(len(x), M, dsub)
    d = ((q[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
    codes = d.argmin(axis=2)  # n x m
    sse = d.min(axis=2).sum(axis=1)  # n
    return books, q, d, codes, sse


def test_rmse_is_lossy_but_tight(spark, sf_dir):
    """The oracle pins exactness; this pins QUALITY: reconstruction error
    is nonzero (compression is lossy) yet well under the signal RMS."""
    from youtube_etl_project_spark.registry import load_all_plans

    ids, x = _load_np(spark, sf_dir)
    got = {
        r["vec_id"]: r["pq_rmse"]
        for r in load_all_plans()["embed_pq_rmse"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(ids)
    _, _, _, _, sse = _exact_parts_np(ids, x)
    expect = np.sqrt(sse.astype(np.float64) / DIM) / 1e6
    for i, vid in enumerate(ids):
        assert got[vid] == pytest.approx(round(expect[i], 6), abs=1e-9)
    mean_rmse = float(expect.mean())
    rms_norm = float(np.sqrt((x * x).mean()))
    assert 0 < mean_rmse < rms_norm


def test_adc_recall_and_self_match(spark, sf_dir):
    """ADC quality floors under the exact-grid trainer (the oracle pins
    the values; this pins that they are USEFUL): recall@10 vs exact L2,
    rank correlation, and the self-match-at-rank-1 property."""
    from youtube_etl_project_spark.registry import load_all_plans

    ids, x = _load_np(spark, sf_dir)
    out = load_all_plans()["embed_pq_adc_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    q_ids = ids[:5]
    assert sorted(got) == sorted(q_ids.tolist())

    _, _, d, codes, _ = _exact_parts_np(ids, x)
    recalls = []
    for qi, qid in enumerate(q_ids):
        lut = d[qi]  # m x k exact int distances for this query
        adist = lut[np.arange(M), codes].sum(axis=1)
        exact = ((x - x[qi]) ** 2).sum(axis=1)
        true10 = set(ids[np.lexsort((ids, exact))[:10]].tolist())
        have = [v for _, v in sorted(got[qid])]
        recalls.append(len(true10 & set(have)))
        assert recalls[-1] >= 2
        assert np.corrcoef(adist.astype(np.float64), exact)[0, 1] >= 0.5
        assert have[0] == qid  # self-match: rank 1
    assert np.mean(recalls) >= 3


def test_rerank_improves_recall(spark, sf_dir):
    """Exact re-rank of the ADC shortlist must not lose recall vs raw
    ADC (measured ~0.8 at 20% shortlist on the near-random corpus)."""
    from youtube_etl_project_spark.registry import load_all_plans

    ids, x = _load_np(spark, sf_dir)
    out = load_all_plans()["embed_pq_rerank_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))

    _, _, d, codes, _ = _exact_parts_np(ids, x)
    adc_recalls, rr_recalls = [], []
    for qi, qid in enumerate(ids[:5]):
        lut = d[qi]
        adist = lut[np.arange(M), codes].sum(axis=1)
        exact = ((x - x[qi]) ** 2).sum(axis=1)
        true10 = set(ids[np.lexsort((ids, exact))[:10]].tolist())
        adc10 = set(ids[np.lexsort((ids, adist))[:10]].tolist())
        adc_recalls.append(len(true10 & adc10))
        rr_recalls.append(len(true10 & {v for _, v in sorted(got[qid])}))
    assert np.mean(rr_recalls) >= np.mean(adc_recalls)
    assert np.mean(rr_recalls) >= 5
