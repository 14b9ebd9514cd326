"""Leakage property of the cluster-hash split: near-duplicate pairs never
straddle the train/test boundary (the reason the split hashes cluster
roots instead of doc ids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_no_near_dup_pair_straddles_the_split(spark, sf_dir):
    out = load_all_plans()["train_test_split_leakage_safe"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    )
    sides = (
        pairs.join(
            out.select(F.col("doc_id").alias("id_a"),
                       F.col("split").alias("split_a")), "id_a")
        .join(
            out.select(F.col("doc_id").alias("id_b"),
                       F.col("split").alias("split_b")), "id_b")
    )
    assert pairs.count() > 0  # fixture actually has near-dup pairs
    assert sides.filter("split_a <> split_b").count() == 0

    # every cluster lands on exactly one side
    assert (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )

    # and both sides are non-empty (the split actually splits)
    assert out.select("split").distinct().count() == 2
