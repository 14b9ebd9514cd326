"""EWMA pinning: the closed-form ordered-running-sum rewrite in
plans/analytics7.py must equal the literal recursion y_t = αx_t +
(1-α)y_{t-1} computed in plain Python from the same daily counts."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from youtube_etl_project_spark.plans.analytics7 import _ALPHA
from youtube_etl_project_spark.registry import load_all_plans
from youtube_etl_project_spark.sources import load_table


def test_closed_form_matches_recursion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], float(r["x"])))
    expected = {}
    for et, pts in series.items():
        y = None
        for day, x in sorted(pts):
            y = x if y is None else _ALPHA * x + (1 - _ALPHA) * y
            expected[(et, day)] = y

    got = load_all_plans()["events_ewma_daily"].fn(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        want = expected[(r["event_type"], r["day"])]
        assert math.isclose(r["ewma"], want, rel_tol=1e-6, abs_tol=1e-6), (
            r["event_type"], r["day"], r["ewma"], want,
        )
