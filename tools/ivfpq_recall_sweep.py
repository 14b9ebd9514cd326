"""IVF-PQ refine-size sweep: recall@5 vs the exact brute-force cosine
top-5 as the ADC shortlist size R grows (R=0 = rank by raw ADC).

Quality evidence for plans/ivfpq.py's _RERANK=40 default — shows where
the refine stage saturates against the IVF probe ceiling (the best any
refine can do given the probed cells). Times are omitted on purpose:
recall fractions are deterministic, and this sweep may run on a busy
host; the bench carries the timing evidence.

Usage:  python tools/ivfpq_recall_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SWEEP = (0, 10, 20, 40, 80, 160)


def main() -> None:
    import youtube_etl_project_spark.plans.ivfpq as ivfpq
    from youtube_etl_project_spark.operators import similarity
    from youtube_etl_project_spark.registry import load_all_plans
    from youtube_etl_project_spark.session import get_spark
    from youtube_etl_project_spark.sources import load_table

    spark = get_spark("ivfpq-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    plans = load_all_plans()

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    exact = {}
    for r in similarity.brute_force_topk(q, c, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    ivf = {}
    for r in plans["embed_ivf_ann"].fn(spark, SF).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
    ceil = sum(
        len(ivf.get(k, set()) & s) / len(s) for k, s in exact.items()
    ) / len(exact)

    n = emb.count()
    auto_r = ivfpq._refine_r(n)
    print(f"| R (refine shortlist) | recall@5 |  |")
    print(f"|---|---|---|")
    try:
        for rr in SWEEP:
            # R=0: rank by raw ADC (shortlist == final top-5)
            ivfpq._RERANK_OVERRIDE = rr if rr else 5
            got = {}
            for r in ivfpq.embed_ivfpq_ann(spark, SF).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            rec = sum(
                len(got.get(k, set()) & s) / len(s)
                for k, s in exact.items()
            ) / len(exact)
            mark = f"← auto R at n={n}" if rr == auto_r else ""
            # R=0 runs with refine shortlist = final k (5): the
            # recall@5 SET equals pure ADC ranking (exact-refining 5
            # candidates can only permute them), but ranks/dist_q come
            # from the refine — hence "set-equivalent", not identical
            # (ADVICE r8).
            label = str(rr) if rr else "0 (ADC-only set-equivalent)"
            print(f"| {label} | {rec:.3f} | {mark} |")
    finally:
        ivfpq._RERANK_OVERRIDE = None
    print()
    print(f"IVF probe ceiling (exact re-rank of ALL probed-cell "
          f"candidates): {ceil:.3f}")


if __name__ == "__main__":
    main()
