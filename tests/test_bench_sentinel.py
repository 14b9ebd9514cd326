"""Pin the between-rows stall sentinel (VERDICT r11 #1).

Round 11's driver record carried a contiguous stretch of rows at 3-10x
their reproducible cost with ``contended:false`` because the contention
probe ran only at the start and end of the bench. ``bench.timed_rows``
probes between rows and re-samples a row whose probe says the host
stalled; these tests drive it with fake clocks so the retry/flag logic
is pinned without running Spark.
"""

from __future__ import annotations

import bench


def _mk_samples(seq: dict[str, list[list[float]]]):
    """samples_of stub: pops the next sample batch for the row."""

    def samples_of(name: str) -> list[float]:
        return seq[name].pop(0)

    return samples_of


def test_quiet_run_takes_min_and_records_no_stalls():
    samples = _mk_samples({"q": [[2.0, 1.5]]})
    timings, stalls = bench.timed_rows(
        ["q"], samples, probe=lambda: 0.01, py_ref=0.01, sleep=lambda s: None
    )
    assert timings == {"q": 1.5}
    assert stalls == {}


def test_stalled_row_is_resampled_and_min_over_all_samples_kept():
    # first pass stalled (probe high), retry clean and faster
    samples = _mk_samples({"q": [[9.0, 8.0], [1.2, 1.1]]})
    probes = iter([0.09, 0.01])  # 9x ref, then settled
    timings, stalls = bench.timed_rows(
        ["q"], samples, probe=lambda: next(probes), py_ref=0.01,
        sleep=lambda s: None,
    )
    assert timings == {"q": 1.1}
    assert stalls["q"]["cleared"] is True
    assert stalls["q"]["retries"] == 1


def test_never_settling_probe_marks_row_uncleared():
    batches = [[5.0], [4.0], [3.0]]
    samples = _mk_samples({"q": [list(b) for b in batches]})
    timings, stalls = bench.timed_rows(
        ["q"], samples, probe=lambda: 1.0, py_ref=0.01, sleep=lambda s: None
    )
    assert timings == {"q": 3.0}  # min over every sample still reported
    assert stalls["q"]["cleared"] is False
    assert stalls["q"]["retries"] == bench.MAX_ROW_RETRIES


def test_stall_can_only_add_samples_never_replace():
    # retry slower than the stalled pass: min keeps the original sample
    samples = _mk_samples({"q": [[1.0], [2.0]]})
    probes = iter([1.0, 0.01])
    timings, _ = bench.timed_rows(
        ["q"], samples, probe=lambda: next(probes), py_ref=0.01,
        sleep=lambda s: None,
    )
    assert timings == {"q": 1.0}
