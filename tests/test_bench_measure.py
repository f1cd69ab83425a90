"""Unit tests for bench.py's multi-window measurement logic.

The bench is the driver's artifact of record; BENCH_r04 showed what happens
when its measurement path is the one untested thing in the repo (a single
transient window became the round's number — PERF.md round-5 postmortem).
These tests drive bench.measure() with synthetic window functions: no
device, no timing dependence.
"""

import sys

import pytest

import bench


def _window_from_rates(rates, imgs_per_iter=128):
    """window(iters) stub: pops the next per-window rate (img/s) and returns
    the elapsed seconds that rate implies. The first call is the calibration
    window."""
    seq = iter(rates)

    def window(iters):
        return imgs_per_iter * iters / next(seq)

    return window


def test_stable_windows_take_exactly_three():
    w = _window_from_rates([2650.0, 2727.0, 2726.0, 2728.0])
    med, spread, rates, iters = bench.measure(w, 128)
    assert rates == pytest.approx([2727.0, 2726.0, 2728.0])
    assert med == pytest.approx(2727.0)
    assert spread == pytest.approx(2.0 / 2727.0)


def test_calibration_targets_ten_seconds_capped_at_200():
    # ~48 ms/step (2,6xx img/s at bs 128): 10.5 s needs ~219 iters -> cap 200
    w = _window_from_rates([2650.0] * 4)
    _, _, _, iters = bench.measure(w, 128)
    assert iters == 200
    # very slow step (2 s/iter): floor at min_iters
    slow = _window_from_rates([64.0] * 4)
    _, _, _, iters = bench.measure(slow, 128)
    assert iters == 20


def test_transient_slow_window_cannot_define_the_median(capsys):
    # BENCH_r04's failure mode: one degraded-tunnel window among good ones.
    # Spread stays >10% (the bad window remains in the list), so measure()
    # retries to max_windows — and the MEDIAN lands on the healthy rate.
    w = _window_from_rates([2650.0, 2700.0, 1449.0, 2710.0, 2705.0, 2708.0, 2712.0])
    med, spread, rates, _ = bench.measure(w, 128)
    assert len(rates) == 6
    assert med == pytest.approx(2706.5)  # median of the six, not 1449
    assert spread > 0.10  # and the artifact SAYS the environment was noisy
    assert "transient tunnel/backend" in capsys.readouterr().err


def test_persistently_degraded_environment_is_reported_not_hidden():
    # every window slow and noisy: the median reflects reality and the
    # spread field flags it — no silent retry-until-lucky
    w = _window_from_rates([1500.0, 1400.0, 1600.0, 1300.0, 1450.0, 1350.0, 1500.0])
    med, spread, rates, _ = bench.measure(w, 128)
    assert len(rates) == 6
    assert 1300.0 <= med <= 1600.0
    assert spread > 0.10


def test_spread_at_the_limit_does_not_retry():
    # boundary: spread == limit is acceptable (strictly-greater triggers
    # the retry); the range can only grow with more windows, so a limit
    # breach always runs to max_windows — by design, the median is what
    # absorbs the outlier, not the retry
    w = _window_from_rates([2650.0, 100.0, 90.0, 100.0])
    med, spread, rates, _ = bench.measure(w, 128)
    assert len(rates) == 3
    assert spread == pytest.approx(0.10)
    assert med == 100.0


def test_median_spread_basis():
    spread, med = bench.median_spread([100.0, 50.0, 100.0])
    assert med == 100.0
    assert spread == pytest.approx(0.5)
