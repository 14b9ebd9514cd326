"""Physical-plan audit across the whole registry — the 100 TB design gates
as executable assertions:

* no row-at-a-time Python UDFs anywhere (BatchEvalPython);
* Arrow/pandas execution only in the operators that genuinely need Python
  (multimodal decode, dense linear algebra);
* dimension joins are broadcast in the star-schema queries;
* predicates reach the parquet scan (PushedFilters).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from youtube_etl_project_spark.registry import load_all_plans

# Queries allowed to run Python at all — each is vectorized (ArrowEvalPython
# / MapInPandas), never row-at-a-time, and each is Python for a reason:
# numpy matmul (similarity/IVF), the stubbed binary decode (multimodal), or
# real BPE merge application (inherently iterative string algorithm — no
# Column-expression equivalent; Arrow-batched with an LRU word cache).
ARROW_ALLOWED = {
    "embed_cosine_topk",
    "embed_lsh_ann",
    "embed_ivf_ann",
    "dedup_embed_cosine_lsh",  # hyperplane-LSH bucket keys: numpy matmul
    "dedup_embed_cosine",  # blocked matmul prefilter + exact-fold verify
    "dedup_hash_embed_cosine",  # same (cosine_pairs_blocked)
    "embed_knn_label_accuracy",  # nn_shortlist_blocked + exact re-rank
    "embed_hard_negatives",  # class_nn_shortlist_blocked + exact re-rank
    "embed_mahalanobis_outliers",  # (x-mu)@Cinv numpy matmul per batch
    "multimodal_decode",
    "multimodal_pixel_stats",  # real ppm/bmp/png pixel decode (stdlib+numpy)
    "multimodal_audio_stats",  # real PCM16 WAV decode (stdlib+numpy)
    "multimodal_audio_features",  # same decode kernel, DSP features
    "multimodal_image_ahash",  # real pixel decode -> 32-bit aHash
    "source_quality_scorer_r2",  # per-group numpy ridge solve (applyInPandas)
    "text_topic_clusters",  # kmeans assignment: numpy matmul per batch
    "multimodal_frame_sample",
    "text_token_count_bpe",
    "pack_sequences_bpe",
    "embed_pca_project",  # PCA apply: (x-mean)@W numpy matmul per batch
    "embed_pq_rmse",  # PQ encode+reconstruct: numpy matmul per batch
    "embed_pq_adc_topk",  # ADC LUT gather over codes: numpy per batch
    "embed_pq_rerank_topk",  # ADC shortlist (numpy) + codegen re-rank
}

_ARROW_OPS = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")

# Queries whose returned frame is a memory-sink scan (the streaming
# parity drains): the streaming job itself ran through codegen; the
# handed-back result is a LocalTableScan with no codegen annotation.
CODEGEN_EXEMPT = {
    "streaming_tumbling_parity",
    "streaming_session_parity",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # AQE wraps un-executed plans in AdaptiveSparkPlan(isFinalPlan=false),
    # which hides codegen annotations from explain("formatted"); static
    # planning shows them ("codegen id : N") and leaves broadcast/pushdown/
    # Python-stage structure identical for audit purposes.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = {}
        for name, spec in load_all_plans().items():
            out[name] = _plan(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return out


def test_no_row_at_a_time_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_python_only_where_vectorized_and_justified(plans):
    offenders = [
        n
        for n, p in plans.items()
        if any(op in p for op in _ARROW_OPS) and n not in ARROW_ALLOWED
    ]
    assert not offenders, f"unexpected Python stages in: {offenders}"


def test_star_schema_queries_broadcast_their_dims(plans):
    for name in (
        "flagship_daily_agg",
        "join_fact_dim",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q10_returned_revenue",
        "tpch_q18_large_orders",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q19_disjunctive_revenue",
    ):
        assert "BroadcastHashJoin" in plans[name], name


def test_fact_filters_push_to_parquet_scan(plans):
    for name in ("filter_kind", "filter_date_incremental", "filter_notnull"):
        plan = plans[name]
        assert "PushedFilters: [" in plan, name
        pushed = [
            line for line in plan.splitlines() if "PushedFilters" in line
        ]
        assert any(
            "[]" not in line for line in pushed
        ), f"{name}: no predicate reached the scan"


def test_whole_stage_codegen_everywhere(plans):
    # every relational query should have at least one codegen span ("codegen
    # id : N" in formatted explain); a plan with none runs fully interpreted
    missing = [
        n
        for n, p in plans.items()
        if "codegen id" not in p
        and n not in ARROW_ALLOWED
        and n not in CODEGEN_EXEMPT
    ]
    assert not missing, f"no codegen span in: {missing}"
