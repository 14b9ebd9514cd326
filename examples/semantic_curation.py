"""Embedding-side corpus curation: the semantic complement to
examples/dedup_corpus.py (which removes LEXICAL near-dups).

    embeddings --> SemDeDup (kmeans cells -> within-cell cosine pairs
                   -> connected components -> min-id survivor)
               --> curated embedding table
               --> distributed PCA over the survivors (moment pass ->
                   eigh -> matmul projection) as the reduced-dim index
                   artifact for downstream ANN

Ordering note: SemDeDup runs on the ORIGINAL vectors, not the PCA
projection. Cosine is not invariant under centering + truncated
projection — a threshold calibrated in the full space transfers to the
reduced space only if the projection keeps most of the variance
(measured here: at 64 -> 16 dims / ~38% variance the fixture's 0.4-cosine
near-dup structure is destroyed). PCA's role in this pipeline is cheap
downstream *search*, where recall loss is tolerable and re-ranking in
full dims fixes precision.

The whole pipeline collects only model-sized state (d² moments, K×dim
centroids) — never data.

Run:  python examples/semantic_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from youtube_etl_project_spark.operators import similarity  # noqa: E402
from youtube_etl_project_spark.session import get_spark  # noqa: E402
from youtube_etl_project_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_root = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="semdedup_")
    )
    spark = get_spark("semantic-curation")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()

    # 1. SemDeDup on the full-dimensional vectors; k ∝ √n bounds the
    #    within-cell self-join; 0.4 is the fixture's near-dup cosine level.
    labels = similarity.semantic_dedup(
        emb, "vec_id", "embedding", k=max(16, int(n**0.5)), threshold=0.4
    )
    survivors = labels.filter(F.col("is_kept") == 1).select(
        F.col("id").alias("vec_id")
    )
    curated = emb.join(survivors, "vec_id")
    curated_path = os.path.join(out_root, "curated")
    curated.write.mode("overwrite").parquet(curated_path)
    kept = curated.count()

    # 2. PCA index artifact over the survivors: train on the distributed
    #    moment pass, apply as one matmul per Arrow batch, persist the
    #    16-dim projection next to the full vectors for coarse ANN.
    curated = spark.read.parquet(curated_path)
    _, mean, cov = similarity.pca_moments(curated)
    vals, comps = similarity.pca_components(cov)
    kept_var = sum(vals[:16]) / sum(vals)
    index_path = os.path.join(out_root, "pca_index")
    similarity.pca_project(curated, mean, comps, 16, out="proj").select(
        "vec_id", "proj"
    ).write.mode("overwrite").parquet(index_path)

    print(f"vectors:   {n}")
    print(f"kept:      {kept}  (dropped {n - kept} semantic dups)")
    print(f"pca index: 64 -> 16 dims ({kept_var:.1%} variance kept)")
    print(f"curated:   {curated_path}")
    print(f"index:     {index_path}")


if __name__ == "__main__":
    main()
