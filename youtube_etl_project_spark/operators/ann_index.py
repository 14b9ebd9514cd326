"""Persisted IVF index: build once, query many, append increments.

``similarity.ivf_topk`` trains and assigns on every call — right for the
oracle gate, wrong for production, where the corpus is ~static and
queries arrive forever. This module materializes the two IVF artifacts
the same way ``dedup.lsh_index`` does for near-dup:

* ``<path>/centroids`` — the K×dim coarse quantizer (the *model*; a few
  KB, read driver-side at query time).
* ``<path>/assignments`` — (id, embedding, cell) **partitioned by
  cell**, so probing n_probe of K cells is PARTITION PRUNING: a query
  batch physically reads n_probe/K of the index files (asserted in
  tests/test_ann_index.py), the file-skipping twin of the Z-order story
  in operators/layout.py.

Increments: ``ivf_append`` assigns new vectors with the FROZEN centroids
and appends only their cell partitions — O(batch) work, no corpus
rescan, mirroring ``incremental_minhash_pairs``. Centroids are not
retrained on append; after heavy drift rebuild (cells stay balanced only
while the data distribution matches the training sample — the standard
IVF operational caveat, handled by monitoring cell sizes via
``ivf_cell_stats``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.similarity import (
    cosine,
    kmeans_centroids,
    nearest_centroid_vectorized,
)


def _assign(vectors: DataFrame, centroids: "list[list[float]]",
            id_col: str, vec: str) -> DataFrame:
    return vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec).alias("embedding"),
        nearest_centroid_vectorized(centroids)(F.col(vec)).alias("cell"),
    )


def ivf_build(
    vectors: DataFrame,
    path: str,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> None:
    """Train the quantizer and materialize the index at ``path``."""
    spark = vectors.sparkSession
    centroids = kmeans_centroids(vectors, vec=vec, k=k, iters=iters,
                                 id_col=id_col)
    rows = [(i, c) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    _assign(vectors, centroids, id_col, vec).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/assignments")


def ivf_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> None:
    """Add a batch under the frozen quantizer: assign cells map-side,
    append only the touched cell partitions. O(batch); the existing index
    is never read or rewritten."""
    centroids = ivf_centroids(new_vectors.sparkSession, path)
    _assign(new_vectors, centroids, id_col, vec).write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{path}/assignments")


def ivf_centroids(spark: SparkSession, path: str) -> "list[list[float]]":
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    return [list(map(float, r.centroid)) for r in rows]


def ivf_cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """Rows per cell — the drift monitor: a cell ballooning past its
    siblings means the frozen quantizer no longer fits the data and the
    index should be rebuilt."""
    return (
        spark.read.parquet(f"{path}/assignments")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ivf_query(
    queries: DataFrame,
    path: str,
    k: int = 5,
    n_probe: int = 3,
    query_id: str = "query_id",
    vec: str = "embedding",
) -> DataFrame:
    """Top-k cosine against the persisted index.

    The query batch computes its probe cells map-side against the
    driver-held centroid matrix; the assignments scan carries a
    ``cell IN (probed)`` predicate, which Spark turns into partition
    pruning — only the probed cells' files are read. Returns
    (query_id, neighbor_id, rank, cosine) like the in-memory twins.
    """
    spark = queries.sparkSession
    centroids = ivf_centroids(spark, path)
    # One nested centroid-matrix literal + indexed transform (see
    # similarity.ivf_topk): per-element F.lit at auto-scaled K is a py4j
    # and expression-tree blowup.
    dists = F.transform(
        F.lit(centroids),
        lambda cvec, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec), cvec, lambda a, b: (a.cast("double") - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.alias("cell"),
        ),
    )
    probed = queries.select(
        query_id,
        F.col(vec).alias("__qv"),
        F.transform(
            F.slice(F.array_sort(dists), 1, n_probe),
            lambda s: s.getField("cell"),
        ).alias("__probes"),
    )
    # Distinct probed cells reach the scan as a pushable partition filter.
    # The collect is bounded by the QUERY batch (queries broadcast in every
    # top-k variant here — they are the small side by contract), and is
    # what converts the probe set into literal partition pruning.
    cells = sorted(
        {c for r in probed.select("__probes").collect() for c in r[0]}
    )
    assignments = (
        spark.read.parquet(f"{path}/assignments")
        .filter(F.col("cell").isin(cells))
        .select(F.col("id").alias("neighbor_id"),
                F.col("embedding").alias("__cv"), "cell")
    )
    q = probed.select(
        query_id, "__qv", F.explode("__probes").alias("cell")
    )
    from pyspark.sql import Window

    scored = (
        q.join(assignments, "cell")
        .filter(F.col(query_id) != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
