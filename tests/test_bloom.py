"""Bloom-filter join pruning: no false negatives (the correctness
invariant), real pruning (the point of the pattern), and bitmap shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import bloom
from youtube_etl_project_spark.sources import load_table

M, K = 1 << 17, 5


def test_no_false_negatives_and_real_pruning(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("__bk"))
        .distinct()
    )
    bitmap = bloom.build_bloom(keys, "__bk", M, K)
    assert len(bitmap) == M // 64

    # every build key passes its own probe — zero false negatives
    misses = keys.filter(
        ~bloom.might_contain(F.col("__bk"), bitmap, M, K)
    ).count()
    assert misses == 0

    # the prefilter must actually prune: rows passing the bloom are a
    # strict subset of the fact table but a superset of the true matches
    n_fact = lineitem.count()
    n_pass = lineitem.filter(
        bloom.might_contain(F.col("l_orderkey"), bitmap, M, K)
    ).count()
    n_true = lineitem.join(
        keys, lineitem["l_orderkey"] == keys["__bk"], "left_semi"
    ).count()
    assert n_true <= n_pass < n_fact

    # composed operator == plain semi-join, row for row
    got = bloom.bloom_semi_join(
        lineitem.select("l_orderkey", "l_linenumber"),
        keys,
        "l_orderkey",
        "__bk",
    )
    assert got.count() == n_true
