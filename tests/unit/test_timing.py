"""Unit tests for the benchmark timing estimator (benchmarks/timing.py).

The estimator is load-bearing for every committed number (DESIGN.md §5), so
its arithmetic — median-of-positive-slopes, cross-rep spread, alternation
order, the distinguishability rule — is pinned here with synthetic timings
(no devices, no sleeps beyond a few ms).
"""

import time

import pytest

from benchmarks.timing import (
    _paired_slope,
    alternating_run_slopes_ms,
    deltas_distinguishable,
    median_slope,
)


def _detail(slopes):
    """Build a _paired_slope detail from per-rep slopes (ms/step) via
    synthetic (short, long) chain times with 100 extra steps per chain."""
    n_short, n_long = 100, 200
    times = {
        n_short: [0.5 for _ in slopes],
        n_long: [0.5 + s * (n_long - n_short) / 1e3 for s in slopes],
    }
    return _paired_slope(times, n_short, n_long, len(slopes))


def test_paired_slope_median_and_spread():
    slope, det = _detail([1.0, 3.0, 2.0, 4.0])
    # Upper median of the sorted positive slopes [1, 2, 3, 4] -> 3.
    assert slope == pytest.approx(3.0, rel=1e-6)
    assert det["spread_ms"] == pytest.approx(3.0, rel=1e-6)  # 4 - 1
    assert det["spread_pct"] == pytest.approx(100.0, abs=0.2)
    assert det["slopes_ms"] == pytest.approx([1.0, 3.0, 2.0, 4.0], abs=1e-3)
    assert det["reliable"]
    assert det["host_cpus"] >= 1


def test_paired_slope_drops_negative_drift_reps():
    slope, det = _detail([2.0, -5.0, 2.2])
    assert slope == pytest.approx(2.2, rel=1e-6)  # median of [2.0, 2.2]
    assert det["spread_ms"] == pytest.approx(0.2, abs=1e-6)


def test_paired_slope_all_negative_is_nan_unreliable():
    slope, det = _detail([-1.0, -2.0])
    assert slope != slope
    assert not det["reliable"]


def test_median_slope_recomputes_from_detail():
    _, det = _detail([1.0, 3.0, 2.0, 4.0])
    assert median_slope(det) == pytest.approx(3.0, rel=1e-6)
    assert median_slope({"slopes_ms": []}) != median_slope({"slopes_ms": []})


def test_deltas_distinguishable_rule():
    _, a = _detail([1.0, 1.1, 1.05])  # median 1.05-ish, spread 0.1
    _, b = _detail([2.0, 2.1, 2.05])
    assert deltas_distinguishable(a, b)  # delta ~1.0 >> spread 0.1
    _, c = _detail([1.0, 2.0, 1.5])  # spread 1.0 swallows the delta
    assert not deltas_distinguishable(a, c)
    assert not deltas_distinguishable(a, {"slopes_ms": [], "spread_ms": 1.0})


def test_alternating_interleaves_runners_within_reps():
    order = []

    def make(name, per_step_s):
        def run(n):
            order.append(name)
            time.sleep(per_step_s * n)
        return run

    out = alternating_run_slopes_ms(
        {"a": make("a", 2e-5), "b": make("b", 4e-5)},
        n_short=20, n_long=60, reps=3,
    )
    # Every rep times a's pair then b's pair: strict interleave, not blocks.
    assert order == ["a", "a", "b", "b"] * 3
    slope_a, det_a = out["a"]
    slope_b, det_b = out["b"]
    assert len(det_a["slopes_ms"]) == 3
    # b's per-step time is ~2x a's (sleep granularity is coarse; allow wide
    # bands — the point is ordering and plumbing, not clock precision).
    assert slope_b > slope_a > 0
