"""Pin the driver-facing bench line inside its capture window.

The driver records only the last ~2000 characters of bench.py's combined
output and json-parses the FINAL line. BENCH_r4/r5 came back
``"parsed": null`` the moment the inline record outgrew that window, so
``bench.compact_line`` enforces a budget. This test drives it with the
real headline list at worst-case numeric widths (999.99 per query) so a
growing HEADLINE breaks HERE, not in the driver's round record.
"""

from __future__ import annotations

import json

import bench


def _full(per_query: float) -> dict:
    qs = {n: per_query for n in bench.HEADLINE}
    return {
        "metric": "headline_queries_total_sec",
        "value": round(per_query * len(qs), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "value_normalized_py": 12345.678,
        "contended_run": False,
    }


def test_compact_line_fits_window_at_worst_case_widths():
    line = bench.compact_line(_full(999.99))
    assert len(line) <= bench.MAX_LINE
    rec = json.loads(line)
    # the driver contract fields survive every shrink step
    assert rec["metric"] == "headline_queries_total_sec"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert set(rec["queries"]) == set(bench.HEADLINE)


def test_compact_line_keeps_extras_at_typical_widths():
    rec = json.loads(bench.compact_line(_full(12.34)))
    assert rec["norm_py"] == 12345.678
    assert rec["contended"] is False


def test_compact_line_is_single_line_json():
    line = bench.compact_line(_full(1.0))
    assert "\n" not in line
    json.loads(line)
