"""Day-2 operations: the checks a serving/pipeline team runs AFTER the
daily load lands (the reference schedules its load daily from a timer —
`azure-functions/function_app.py:275-528`; these are the questions asked
the morning after).

    1. snapshot diff      (what did last night's load actually do —
                           added/removed/changed keys, per-column
                           change counts, via REAL ParquetTable time
                           travel: read_version(1) vs read_version(0))
    2. embedding drift    (does today's corpus still look like the one
                           the models were built on — per-dimension TVD
                           over a fixed histogram, exact bigint)
    3. value-distribution (did a metric's whole CDF shift — exact
       shift (KS)          two-sample Kolmogorov-Smirnov via the
                           distributed prefix-sum, no single-task
                           window)
    4. join-skew          (is tonight's big join safe — hottest keys,
       pre-flight          ppm shares, and the salt factor each would
                           need in salted_join)

Every stage is the operator the registry also exposes as a standalone
oracle-checked query (table_diff_versions, embed_drift_report,
events_ab_ks, join_skew_report) — this script is the composition, with
the thresholds a team would actually gate on.

Run:  python examples/day2_operations.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_etl_project_spark.registry import load_all_plans  # noqa: E402
from youtube_etl_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("day2-operations")
    spark.sparkContext.setLogLevel("ERROR")
    plans = load_all_plans()

    print("1. Snapshot diff (time travel, v_prev vs v_curr):")
    diff = {r["change"]: r for r in
            plans["table_diff_versions"].fn(spark, sf_dir).collect()}
    for cls in ("added", "removed", "changed", "unchanged"):
        r = diff.get(cls)
        if r is None:
            continue
        extra = (f"  (status: {r['n_status_changed']}, "
                 f"price: {r['n_price_changed']})" if cls == "changed" else "")
        print(f"   {cls:<10} {r['n_rows']:>8} keys{extra}")

    print("2. Embedding drift (TVD per dimension, gate at 0.10):")
    drifted = sorted(
        (r for r in plans["embed_drift_report"].fn(spark, sf_dir).collect()
         if r["tvd"] >= 0.10),
        key=lambda r: -r["tvd"],
    )
    if drifted:
        for r in drifted[:5]:
            print(f"   dim {r['dim']:>3}  tvd={r['tvd']:.4f}  "
                  f"worst-bin num={r['linf_num']}")
        print(f"   -> {len(drifted)} dimension(s) over gate: "
              "rebuild candidates (IVF/PQ artifacts trained on the "
              "reference cohort)")
    else:
        print("   all 64 dimensions under 0.10 — snapshot promotable")

    print("3. Value-distribution shift (exact two-sample KS):")
    ks_rows = plans["events_ab_ks"].fn(spark, sf_dir).collect()
    if not ks_rows or ks_rows[0]["na"] == 0 or ks_rows[0]["nb"] == 0:
        print("   no data in one or both cohorts — KS not applicable")
    else:
        ks = ks_rows[0]
        # 1.36 ~ the alpha=0.05 critical coefficient, two-sided test
        crit = 1.36 * ((ks["na"] + ks["nb"]) / (ks["na"] * ks["nb"])) ** 0.5
        verdict = "SHIFTED" if ks["d"] > crit else "stable"
        print(f"   D={ks['d']:.5f} at value={ks['ks_at']:.4f} "
              f"(n_a={ks['na']}, n_b={ks['nb']}, crit={crit:.5f}) "
              f"-> {verdict}")

    print("4. Join-skew pre-flight (events.user_id):")
    rows = sorted(plans["join_skew_report"].fn(spark, sf_dir).collect(),
                  key=lambda r: r["rank"])
    if not rows:
        print("   empty table — nothing to join")
        return
    worst = rows[0]
    print(f"   {worst['n_keys']} keys / {worst['n_rows']} rows; hottest "
          f"key {worst['key']} holds {worst['share_ppm']} ppm "
          f"(salt_factor {worst['salt_factor']})")
    if worst["salt_factor"] > 1:
        print("   -> salt the hot keys (operators/skew.salted_join) or "
              "let AQE split them; plain shuffle would bottleneck one "
              "reducer")
    else:
        print("   -> uniform enough for a plain shuffle join")


if __name__ == "__main__":
    main()
