"""Optimization measurement harness (rounds 11/12).

Times individual declared queries end-to-end with the noop sink (guide
§1.4 — full materialization, no driver collect, no output cost) and
captures ``explain("formatted")`` for the plan-diff deliverables under
``plans/<round>/``. Usage:

    python tools/opt_measure.py [--sf DIR] [--tag before|after] [--reps N]
        [--round r12] [--no-plans] query [query ...]

Prints one line per query: ``<name> best=<s> runs=[...]`` and writes
``plans/<round>/<name>_<tag>.txt`` unless --no-plans. The session is the
tuned ``session.get_spark()`` (same as bench.py); jobs are labelled so
the UI/event log is readable (guide §1.5).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r12", dest="round_dir")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from youtube_etl_project_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", args.round_dir)
    os.makedirs(plan_dir, exist_ok=True)

    # session/JIT warmup on a cheap query so the first measured rep is not
    # paying executor spin-up (bench.py does the same)
    qs["flagship_daily_agg"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.queries:
        df = qs[name](spark, args.sf)
        if args.tag and not args.no_plans:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        runs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name} best={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
