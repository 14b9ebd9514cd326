"""Hand-computed pin of the drift-report semantics (plans/monitoring.py):
fixed-grid binning with edge clamping, zero-count bins restored by the
spine, and the exact-bigint TVD/L∞ arithmetic. Cross-engine equality is
the oracle gate's job; this pins WHAT the numbers mean."""

from __future__ import annotations

from youtube_etl_project_spark.plans.monitoring import drift_report

# bins=4 over q=[-500000, 500000): width 250k ->
#   [-0.5,-0.25) -> 0, [-0.25,0) -> 1, [0,0.25) -> 2, [0.25,0.5) -> 3
# values at/beyond the edges clamp into the boundary bins (the -0.6 and
# 0.9 components below).
_ROWS = [
    (0, [-0.4, 0.1]),  # dims -> bins (0, 2)
    (0, [-0.3, 0.3]),  # (0, 3)
    (0, [0.0, 0.9]),  # (2, 3)   0.9 clamps into bin 3
    (1, [-0.4, -0.6]),  # (0, 0)  -0.6 clamps into bin 0
    (1, [0.2, 0.1]),  # (2, 2)
]


def test_drift_report_hand_computed(spark):
    df = spark.createDataFrame(_ROWS, "grp int, embedding array<float>")
    out = drift_report(
        df, dims=2, bins=4, scale=1_000_000, span=500_000
    ).collect()
    got = {r.dim: r for r in out}
    assert set(got) == {0, 1}

    # dim 0: ref bins {0:2, 2:1}, cur bins {0:1, 2:1}; N_ref=3, N_cur=2
    # per-bin |c_ref*N_cur - c_cur*N_ref|: bin0 |4-3|=1, bin2 |2-3|=1
    r0 = got[0]
    assert (r0.n_ref, r0.n_cur) == (3, 2)
    # exact numerators are reported as digit strings (engine-neutral
    # under the driver comparator; see plans/monitoring.py)
    assert (int(r0.tvd_num), int(r0.linf_num)) == (2, 1)
    assert abs(r0.tvd - 2 / 12) < 1e-15

    # dim 1: ref bins {2:1, 3:2}, cur bins {0:1, 2:1}
    # bin0 |0-3|=3, bin2 |2-3|=1, bin3 |4-0|=4 -> sum 8, max 4
    r1 = got[1]
    assert (int(r1.tvd_num), int(r1.linf_num)) == (8, 4)
    assert abs(r1.tvd - 8 / 12) < 1e-15


def test_drift_report_identical_cohorts_zero(spark):
    base = [v for g, v in _ROWS if g == 0]
    rows = [(0, v) for v in base] + [(1, v) for v in base]
    df = spark.createDataFrame(rows, "grp int, embedding array<float>")
    out = drift_report(
        df, dims=2, bins=4, scale=1_000_000, span=500_000
    ).collect()
    assert len(out) == 2
    assert all(int(r.tvd_num) == 0 and int(r.linf_num) == 0 and r.tvd == 0.0
               for r in out)


def test_key_skew_report_hand_computed(spark):
    from youtube_etl_project_spark.operators.skew import key_skew_report

    # 10 rows: key 7 appears 6x (hot), key 3 appears 3x, key 9 once.
    rows = [(7,)] * 6 + [(3,)] * 3 + [(9,)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_report(df, "k", top_k=2, target_partitions=4)
    got = {r.key: r for r in out.collect()}
    assert set(got) == {7, 3}  # top-2 by count

    r7 = got[7]
    assert (r7.cnt, r7.rank) == (6, 1)
    assert (r7.n_rows, r7.n_keys, r7.max_cnt) == (10, 3, 6)
    assert r7.share_ppm == 600_000
    # ceil(6*4/10) = ceil(2.4) = 3 -> spread the hot key 3 ways
    assert r7.salt_factor == 3

    r3 = got[3]
    assert (r3.cnt, r3.rank) == (3, 2)
    assert r3.share_ppm == 300_000
    assert r3.salt_factor == 2  # ceil(3*4/10) = 2


def test_key_skew_report_tie_rank_by_key(spark):
    from youtube_etl_project_spark.operators.skew import key_skew_report

    rows = [(1,), (1,), (2,), (2,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    got = {
        r.key: r
        for r in key_skew_report(df, "k", top_k=3).collect()
    }
    # ties (cnt=2) rank by key ASC: key 1 -> rank 1, key 2 -> rank 2
    assert (got[1].rank, got[2].rank, got[5].rank) == (1, 2, 3)


def test_key_skew_report_null_key_is_ranked(spark):
    """NULL join keys are the classic real-world skew cause — the report
    must rank them, not silently drop them (a plain k2 <= key tie-break
    evaluates to NULL for the NULL-key row)."""
    from youtube_etl_project_spark.operators.skew import key_skew_report

    rows = [(None,)] * 5 + [(3,)] * 3 + [(9,)] * 3 + [(1,)]
    df = spark.createDataFrame(rows, "k long")
    got = {r.key: r for r in key_skew_report(df, "k", top_k=3).collect()}
    assert set(got) == {None, 3, 9}
    assert (got[None].cnt, got[None].rank) == (5, 1)
    # equal-count tie between 3 and 9 breaks by key ASC
    assert (got[3].rank, got[9].rank) == (2, 3)
    assert got[None].salt_factor == 14  # ceil(5*32/12) at default P=32
