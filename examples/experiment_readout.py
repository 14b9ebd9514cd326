"""End-to-end A/B experiment readout: the checks a real experimentation
platform runs, in the order it runs them.

    events (variant = user_id parity)
      --> 1. SRM guard            (chi-square on the type x variant
                                   contingency table — if traffic split
                                   is broken, stop reading metrics)
      --> 2. Welch's t per metric (unequal-variance t on `value` per
                                   event_type)
      --> 3. CUPED adjustment     (pre-period covariate; tighter means,
                                   reported variance reduction)
      --> 4. Bootstrap CI         (Poisson(1) replicas; percentile CI
                                   of the mean difference)
      --> one readout table

Every stage is the operator the registry also exposes as a standalone
oracle-checked query (events_ab_chi2, events_ab_ttest, events_ab_cuped,
events_ab_bootstrap) — this script is the composition. Everything is
deterministic: hash-seeded bootstrap weights, decimal-exact sums,
grid-snapped cross-partition moments.

Run:  python examples/experiment_readout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_etl_project_spark.registry import load_all_plans  # noqa: E402
from youtube_etl_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("experiment-readout")
    spark.sparkContext.setLogLevel("ERROR")
    plans = load_all_plans()

    srm = plans["events_ab_chi2"].fn(spark, sf_dir).collect()[0]
    # chi2 critical value at p=0.05 for the (types-1)x(variants-1) dof —
    # conservative fixed table up to dof 8 (enough for this schema)
    crit = {1: 3.84, 2: 5.99, 3: 7.81, 4: 9.49, 5: 11.07,
            6: 12.59, 7: 14.07, 8: 15.51}.get(int(srm["dof"]), 15.51)
    print(f"1. SRM: chi2={srm['chi2_stat']:.3f} dof={srm['dof']} "
          f"n={srm['n']} -> {'OK' if srm['chi2_stat'] < crit else 'BROKEN SPLIT'}")
    if srm["chi2_stat"] >= crit:
        print("   traffic split is unbalanced; metric readout unreliable")

    print("2. Welch's t per event_type:")
    for r in sorted(plans["events_ab_ttest"].fn(spark, sf_dir).collect(),
                    key=lambda r: r["event_type"]):
        print(f"   {r['event_type']:<10} mean_a={r['mean_a']:<10} "
              f"mean_b={r['mean_b']:<10} t={r['t_stat']} df={r['welch_df']}")

    print("3. CUPED (pre-period covariate):")
    for r in sorted(plans["events_ab_cuped"].fn(spark, sf_dir).collect(),
                    key=lambda r: r["variant"]):
        print(f"   variant={r['variant']} n={r['n_users']} "
              f"mean={r['mean_y']} adj={r['mean_y_cuped']} "
              f"(theta={r['theta']}, var_reduction={r['var_reduction']})")

    b = plans["events_ab_bootstrap"].fn(spark, sf_dir).collect()[0]
    sig = not (b["ci_lo"] <= 0.0 <= b["ci_hi"])
    print(f"4. Bootstrap ({b['n_replicas']} replicas): "
          f"diff={b['mean_diff']} CI=[{b['ci_lo']}, {b['ci_hi']}] "
          f"-> {'significant' if sig else 'not significant'}")


if __name__ == "__main__":
    main()
