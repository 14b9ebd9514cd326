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


def test_rmse_matches_numpy(trained, spark, sf_dir):
    from youtube_etl_project_spark.registry import load_all_plans

    emb, books, ids, x = trained
    dsub = DIM // M
    xs = x.reshape(len(x), M, dsub)
    recon = np.empty_like(xs)
    for s in range(M):
        c2 = (books[s] * books[s]).sum(axis=1)
        d = -2.0 * (xs[:, s, :] @ books[s].T) + c2
        recon[:, s, :] = books[s][d.argmin(axis=1)]
    err = (xs - recon).reshape(len(x), DIM)
    expected = np.sqrt((err * err).mean(axis=1))

    got = {
        r["vec_id"]: r["pq_rmse"]
        for r in load_all_plans()["embed_pq_rmse"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == pytest.approx(round(expected[i], 6), abs=1e-9)
    # compression must actually be lossy-but-tight: nonzero, bounded error
    mean_rmse = float(expected.mean())
    rms_norm = float(np.sqrt((x * x).mean()))
    assert 0 < mean_rmse < rms_norm  # reconstructs most of the energy


def test_adc_ranks_match_numpy_and_recall(trained, spark, sf_dir):
    from youtube_etl_project_spark.registry import load_all_plans

    emb, books, ids, x = trained
    out = (
        load_all_plans()["embed_pq_adc_topk"].fn(spark, sf_dir).collect()
    )
    q_ids = ids[:5]
    dsub = DIM // M
    xs = x.reshape(len(x), M, dsub)
    # numpy ADC: encode all, gather LUTs
    codes = np.zeros((len(x), M), dtype=np.int64)
    for s in range(M):
        c2 = (books[s] * books[s]).sum(axis=1)
        d = -2.0 * (xs[:, s, :] @ books[s].T) + c2
        codes[:, s] = d.argmin(axis=1)

    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adist"])
        )
    assert sorted(got) == sorted(q_ids.tolist())

    recalls = []
    for qi, qid in enumerate(q_ids):
        lut = pq.adc_lut(x[qi], books)  # queries are the 5 lowest ids
        adist = lut[np.arange(M)[:, None].repeat(len(x), 1).T, codes].sum(1)
        order = np.lexsort((ids, np.round(adist, 12)))
        expect = [int(ids[j]) for j in order[:10]]
        have = [(v, a) for _, v, a in sorted(got[qid])]
        # exact rank parity with the numpy replica (vec_id tiebreak)
        assert [h[0] for h in have] == expect
        for j, (_, a) in zip(order[:10], have):
            assert a == pytest.approx(round(float(adist[j]), 6), abs=1e-9)

        # ADC quality on this synthetic near-random corpus (measured:
        # recall@10 2-7/query, mean ~4, Pearson ~0.66-0.72 at both
        # sf0.001 and sf0.01): pin floors under the measurements
        exact = ((x - x[qi]) ** 2).sum(axis=1)
        true10 = set(ids[np.lexsort((ids, exact))[:10]].tolist())
        recalls.append(len(true10 & {h[0] for h in have}))
        assert recalls[-1] >= 2
        assert np.corrcoef(adist, exact)[0, 1] >= 0.5

        # self-match: the query is in the corpus and its reconstruction
        # distance is far below any cross-vector distance → rank 1
        assert have[0][0] == qid
    assert np.mean(recalls) >= 3


def test_rerank_matches_replica_and_improves_recall(trained, spark, sf_dir):
    """embed_pq_rerank_topk == numpy replica of the same pipeline (ADC
    top-100 shortlist, exact-L2 re-rank, vec_id tiebreaks), and the
    re-ranked recall@10 is at least the raw-ADC recall on average."""
    from youtube_etl_project_spark.registry import load_all_plans

    _, books, ids, x = trained
    out = load_all_plans()["embed_pq_rerank_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["l2"])
        )
    dsub = DIM // M
    xs = x.reshape(len(x), M, dsub)
    codes = np.zeros((len(x), M), dtype=np.int64)
    for s in range(M):
        c2 = (books[s] * books[s]).sum(axis=1)
        codes[:, s] = (-2.0 * (xs[:, s, :] @ books[s].T) + c2).argmin(axis=1)

    def fold_l2(a, b):
        # replicate Spark's sequential aggregate fold exactly
        acc = 0.0
        for u, v in zip(a, b):
            d = u - v
            acc = acc + d * d
        return acc

    adc_recalls, rr_recalls = [], []
    for qi, qid in enumerate(ids[:5]):
        lut = pq.adc_lut(x[qi], books)
        ad = lut[np.arange(M)[:, None].repeat(len(x), 1).T, codes].sum(1)
        short = np.lexsort((ids, np.round(ad, 12)))[:100]
        l2s = np.array([fold_l2(x[j], x[qi]) for j in short])
        order = short[np.lexsort((ids[short], l2s))[:10]]
        l2map = dict(zip(short.tolist(), l2s.tolist()))
        expect = [(int(ids[j]), round(l2map[j], 6)) for j in order]
        have = [(v, l2) for _, v, l2 in sorted(got[qid])]
        assert [h[0] for h in have] == [e[0] for e in expect]
        for (hv, hl2), (_, el2) in zip(have, expect):
            assert hl2 == pytest.approx(el2, abs=1e-9)

        exact = ((x - x[qi]) ** 2).sum(axis=1)
        true10 = set(ids[np.lexsort((ids, exact))[:10]].tolist())
        adc10 = set(ids[np.lexsort((ids, np.round(ad, 12)))[:10]].tolist())
        adc_recalls.append(len(true10 & adc10))
        rr_recalls.append(len(true10 & {h[0] for h in have}))
    assert np.mean(rr_recalls) >= np.mean(adc_recalls)
    assert np.mean(rr_recalls) >= 5  # measured ~0.8+ at 20% shortlist
