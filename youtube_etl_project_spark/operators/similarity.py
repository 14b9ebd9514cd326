"""Vector similarity search (SURVEY §2b X3) over ``embeddings.embedding``
(array<float>).

* cosine / dot / norm: array folds over zip_with — JVM-side, codegen'd,
  double accumulation left-to-right (deterministic, matches a sequential
  oracle bit-for-bit).
* brute-force top-k: broadcast the (small) query set against all candidate
  vectors, score per-row, window row_number ≤ k. Linear in candidates —
  the exact baseline.
* LSH (random hyperplane) buckets: deterministic pseudo-random hyperplanes
  derived from xxhash64, sign-bit bucket key; ANN = top-k within bucket.
  The 100 TB path: bucket join replaces the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], accumulated in double left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, cosine).

    ``queries`` must be small (it is broadcast); candidates stream through
    map-side scoring — no shuffle until the per-query top-k window, which
    partitions by query_id. Deterministic tiebreak on neighbor id.
    """
    q = queries.select(
        F.col(query_id), F.col(vec).alias("__qv")
    )
    c = candidates.select(F.col(cand_id), F.col(vec).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(query_id) != F.col(cand_id))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def hyperplane(dim: int, plane_id: int, seed: int = 42) -> Column:
    """Deterministic pseudo-random hyperplane: component j is a signed unit
    derived from xxhash64(plane_id, j, seed) — reproducible across runs and
    engines that share xxhash64."""
    return F.array(
        *[
            F.when(
                F.xxhash64(F.lit(plane_id), F.lit(j), F.lit(seed))
                .bitwiseAND(F.lit(1))
                == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for j in range(dim)
        ]
    )


def lsh_bucket_key(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket key over n_planes random hyperplanes → a long in
    [0, 2^n_planes). Map-side only."""
    key = F.lit(0).cast("long")
    for p in range(n_planes):
        bit = F.when(dot(vec, hyperplane(dim, p, seed)) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        key = key + F.shiftleft(bit.cast("long"), p)
    return key


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only candidates sharing the query's LSH bucket.

    Recall < 1 by construction (use multiple hash tables / fewer planes to
    trade cost for recall); at scale the bucket equi-join shuffles each side
    once on the bucket key instead of materializing the cross product.
    """
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("__qv"),
        lsh_bucket_key(F.col(vec), dim, n_planes, seed).alias("__bucket"),
    )
    c = candidates.select(
        F.col(cand_id),
        F.col(vec).alias("__cv"),
        lsh_bucket_key(F.col(vec), dim, n_planes, seed).alias("__bucket"),
    )
    scored = (
        q.join(c, "__bucket")
        .filter(F.col(query_id) != F.col(cand_id))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
