"""Pin the HLL sketch-merge query (no DuckDB oracle for DataSketches
binaries): estimates must be deterministic and within HLL error bounds of
the exact distinct counts, and the merged total must equal a direct
whole-table sketch estimate (merge = single-pass equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_hll_estimates_within_error_and_merge_consistent(spark, sf_dir):
    q = load_all_plans()["approx_hll_sketch_merge"].fn
    rows = q(spark, sf_dir).collect()
    per_day = [r for r in rows if r.day is not None]
    total = [r for r in rows if r.day is None]
    assert len(total) == 1 and len(per_day) > 0

    # lgConfigK=12 → relative standard error ~1.6%; allow 5 sigma
    for r in per_day:
        assert abs(r.approx_distinct - r.exact_distinct) <= max(
            3, 0.08 * r.exact_distinct
        )

    ev = load_table(spark, sf_dir, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("e")
    ).first()["e"]
    assert total[0].approx_distinct == direct  # merged == single-pass

    again = {(r.day, r.approx_distinct) for r in q(spark, sf_dir).collect()}
    assert again == {(r.day, r.approx_distinct) for r in rows}  # deterministic
