"""IVF-PQ composed ANN (plans/ivfpq.py): recall floor vs brute force
and structural sanity of the ranked output.

The registered plan is oracle-gated (cross-engine agreement proves the
two training loops + ADC + refine reproduce bit-for-bit), but the gate
says nothing about QUALITY — this mirrors test_exact_ivf_recall_floor
for the composed index. Measured at sf0.001: ADC-only recall@5 = 0.30
(32-bit codes on distance-concentrated unit vectors), IVF probe
ceiling = 0.92, ADC-top-40-then-exact-refine = 0.74.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity
from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_ivfpq_recall_floor_and_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }
    rows = load_all_plans()["embed_ivfpq_ann"].fn(spark, sf_dir).collect()
    got = {(r.query_id, r.neighbor_id) for r in rows}
    # refine recovers well above the 0.30 ADC-only floor; leave noise
    # margin under the measured 0.74
    assert len(got & exact) / len(exact) >= 0.6
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
        assert r.dist_q >= 0
    assert len(per_q) == 10
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_persisted_ivfpq_index_bit_identical_and_pruned(spark, sf_dir):
    """round 9: the persisted index (operators/ann_index.ivfpq_*) is
    bit-identical to the in-memory capstone (the exact-grid model makes
    this an equality, not a float approximation), and BOTH data-sized
    scans — ADC codes and exact-refine components — carry the probe set
    as a partition filter."""
    import re

    plans = load_all_plans()
    want = sorted(
        map(tuple, plans["embed_ivfpq_ann"].fn(spark, sf_dir).collect())
    )
    result = plans["embed_ivfpq_index_ann"].fn(spark, sf_dir)
    got = sorted(map(tuple, result.collect()))
    assert got == want

    plan = result._jdf.queryExecution().executedPlan().toString()
    pruned = re.findall(r"PartitionFilters: \[[^\]]*cell[^\]]*IN[^\]]*\]", plan)
    assert len(pruned) >= 2, plan[:3000]  # codes AND components scans
