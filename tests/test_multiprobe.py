"""Multi-probe LSH economics pin (operators/similarity.lsh_ann_md5 with
multiprobe>0): probing 1-flip neighbor buckets in HALF the tables must
recover recall that plain half-table LSH loses — the whole point of
Lv et al.'s technique (index cost ∝ tables; probes are free fan-out).
Everything is deterministic (md5 planes, fixed fixture), so the
comparisons are exact, not statistical."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity

_SF = "/root/testdata/sf0.01"
_NQ = 10
_DIM = 64
_K = 5


def _ground_truth(spark):
    """Exact integer-MIPS top-5 per query (same 1e6 grid as the ANN)."""
    emb = spark.read.parquet(f"{_SF}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    q = lambda c: F.floor(  # noqa: E731
        c.cast("double") * 1_000_000 + F.lit(0.5)
    ).cast("long")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "e")
    ).select("vec_id", "j", q(F.col("e")).alias("q"))
    qs = flat.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), "j", F.col("q").alias("qa")
    )
    cs = flat.select(
        F.col("vec_id").alias("neighbor_id"), "j", F.col("q").alias("qb")
    )
    scored = (
        qs.join(cs, "j")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot_q"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _K
    )
    truth: dict[int, set[int]] = {}
    for r in top.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    return truth


def _recall(spark, n_tables: int, multiprobe: int, truth) -> float:
    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    got = similarity.lsh_ann_md5(
        queries, cands, dim=_DIM, n_tables=n_tables, n_planes=4,
        k=_K, multiprobe=multiprobe,
    )
    found: dict[int, set[int]] = {}
    for r in got.collect():
        found.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(found.get(qid, set()) & t) for qid, t in truth.items()
    )
    return hits / sum(len(t) for t in truth.values())


def test_multiprobe_recovers_recall_of_half_the_tables(spark):
    truth = _ground_truth(spark)
    r_half = _recall(spark, n_tables=2, multiprobe=0, truth=truth)
    r_mp = _recall(spark, n_tables=2, multiprobe=4, truth=truth)
    r_full = _recall(spark, n_tables=4, multiprobe=0, truth=truth)
    # probing 1-flip buckets can only ADD candidates -> recall is
    # monotone; and with half the index it must reach at least the
    # 4-table recall on this (deterministic) fixture.
    # Measured at pin time: 2t plain 0.14, 2t+mp 0.70, 4t plain 0.46,
    # 4t+mp 0.96 — the economics the query's docstring claims.
    assert r_mp >= r_half
    assert r_mp >= r_full
    assert r_mp >= 0.6  # absolute floor on the fixture (measured 0.70)


def test_multiprobe_zero_is_plain_lsh(spark):
    """multiprobe=0 must leave the original path bit-identical."""
    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    a = similarity.lsh_ann_md5(
        queries, cands, dim=_DIM, n_tables=2, n_planes=4, k=_K
    ).collect()
    b = similarity.lsh_ann_md5(
        queries, cands, dim=_DIM, n_tables=2, n_planes=4, k=_K,
        multiprobe=0,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
