"""The driver records only the last 2000 chars of bench.py stdout and
parses the final JSON line out of that tail. BENCH_r04 recorded
parsed:null because the (single) output line outgrew the window — these
tests pin the fix: the LAST printed line must always be a complete JSON
object within TAIL_BUDGET, for the real headline set and for plausible
growth, and must always carry the driver-required envelope keys.
"""

import json

from bench import (
    _CALIB_ROWS,
    _CALIB_UNIT,
    HEADLINE,
    TAIL_BUDGET,
    compose_summary_line,
)

CAL = {
    "work": "range(3.2e9).sum((id*2654435761)%1000003), 32 splits, noop sink",
    "sec_before": 0.724,
    "sec_after": 0.691,
    "spread_before": [0.701, 0.755],
    "spread_after": [0.688, 0.733],
    "unit_work_multiple": 4.0,
}
LOAD = {"start": 31.25, "end": 30.88}


def test_calibration_probe_scale_pinned():
    """VERDICT r8 #3: the ~0.2 s r6-r8 probe put ±20% on the
    normalized trend; the r9 probe is 4× the work and the unit
    multiple must match the row count so normalized figures stay in
    r6-r8 units (divide by sec_before/_CALIB_UNIT ≡ the 800M-row
    probe cost)."""
    assert _CALIB_ROWS == 3_200_000_000
    assert _CALIB_UNIT == _CALIB_ROWS / 800_000_000


def test_calibrate_returns_median_and_spread():
    """_calibrate must report (median, min, max) of three probes —
    the spread is what makes a noisy calibration self-evident in the
    BENCH artifact."""
    import bench

    canned = iter([9.9, 0.3, 0.1, 0.2])  # first value = discarded warm run
    orig = bench._calib_once
    bench._calib_once = lambda spark: next(canned)
    try:
        med, lo, hi = bench._calibrate(spark=None)
    finally:
        bench._calib_once = orig
    assert (med, lo, hi) == (0.2, 0.1, 0.3)


def _line(timings, **kw):
    return compose_summary_line(
        total=round(sum(timings.values()), 3),
        sf=0.1,
        timings=timings,
        calibration=CAL,
        loadavg=LOAD,
        **kw,
    )


def test_real_headline_set_fits_with_all_diagnostics():
    # worst realistic value width: hundreds of seconds with 3 decimals
    timings = {name: 123.456 for name in HEADLINE}
    line = _line(timings)
    assert len(line) <= TAIL_BUDGET
    obj = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in obj
    # the real set is small enough that no diagnostic field is dropped
    assert obj["calibration"] == CAL
    assert obj["loadavg_1m"] == LOAD


def test_grown_headline_set_drops_diagnostics_before_queries():
    # +10 future queries at the real set's typical name width: the
    # envelope must survive by shedding diagnostics, never queries
    timings = {name: 123.456 for name in HEADLINE}
    timings.update({f"future_round_query_{i:02d}": 123.456 for i in range(10)})
    line = _line(timings)
    assert len(line) <= TAIL_BUDGET
    obj = json.loads(line)
    assert "queries" in obj and len(obj["queries"]) == len(HEADLINE) + 10


def test_pathological_set_still_emits_parseable_envelope():
    timings = {f"q_{'x' * 80}_{i:03d}": 123.456 for i in range(60)}
    line = _line(timings)
    assert len(line) <= TAIL_BUDGET
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total_runtime"
    assert obj["value"] > 0 and obj["unit"] == "sec"


def test_tail_budget_under_driver_window():
    assert TAIL_BUDGET <= 1950  # driver window is 2000; keep newline margin


def test_normalized_total_carried_in_summary_line():
    # VERDICT r6 #1: the calibration probe must be USED, not just
    # measured — the summary line carries total/sec_before so host
    # drift and plan regressions are separable from the BENCH artifact
    # alone.
    timings = {name: 123.456 for name in HEADLINE}
    obj = json.loads(_line(timings, normalized_total=178.3))
    assert obj["normalized_total"] == 178.3
    # and omitting it (calibration degenerate) still yields the envelope
    obj = json.loads(_line(timings, normalized_total=None))
    assert "normalized_total" not in obj
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in obj


def test_normalized_total_survives_growth_alongside_envelope():
    timings = {name: 123.456 for name in HEADLINE}
    timings.update({f"future_round_query_{i:02d}": 123.456 for i in range(10)})
    line = _line(timings, normalized_total=178.3)
    assert len(line) <= TAIL_BUDGET
    obj = json.loads(line)
    assert len(obj["queries"]) == len(HEADLINE) + 10
