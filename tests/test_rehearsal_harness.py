"""The rehearsal harness's pass criterion and corpus determinism.

scripts/tpu_recipe_rehearsal.py gates multi-hour chip runs; its verdict
logic must itself be tested (round-4 PERF.md records that the original
per-epoch-monotonicity criterion was wrong and silently failed a healthy
recipe). Pure-python — fast tier."""

import importlib.util
import os
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "tpu_recipe_rehearsal",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "tpu_recipe_rehearsal.py"),
)
rehearsal = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rehearsal)


def test_rising_to_plateau_passes():
    accs = [10, 40, 70, 90, 97, 99, 100, 100, 100, 100, 100, 100]
    ok, plateau, dips = rehearsal.check_curve(accs, threshold=95.0)
    assert ok and plateau == 100.0 and dips == []


def test_mid_schedule_dip_does_not_fail():
    # the round-4 real curve: 96.4/96.5 transients off a 99.9 running best
    accs = [13, 50, 69, 87, 97, 99, 99.9, 96.4, 99.9, 96.5, 100, 100, 100, 100, 100, 100]
    ok, plateau, dips = rehearsal.check_curve(accs, threshold=95.0)
    assert ok and len(dips) == 2


def test_still_rising_into_tail_passes():
    # a slow-converging but healthy curve: every tail epoch is a new best;
    # the late-regression check must compare against the RUNNING best, not
    # the final best (which would veto any curve still improving)
    accs = [10, 30, 50, 70, 80, 88, 92, 95, 96, 98, 99, 100]
    ok, plateau, dips = rehearsal.check_curve(accs, threshold=95.0)
    assert ok and plateau > 98 and dips == []


def test_late_regression_fails():
    # tail epoch regresses >2 points below the running best
    accs = [10, 50, 90, 99, 100, 100, 100, 100, 100, 100, 100, 96.0]
    ok, _, _ = rehearsal.check_curve(accs, threshold=95.0)
    assert not ok


def test_crater_fails_even_mid_schedule():
    # >15-point collapse below the running best = divergence symptom
    accs = [10, 50, 90, 99, 80.0, 99, 100, 100, 100, 100, 100, 100]
    ok, _, _ = rehearsal.check_curve(accs, threshold=95.0)
    assert not ok


def test_missed_plateau_fails():
    accs = [10, 30, 50, 60, 70, 75, 80, 82, 84, 85, 85, 85]
    ok, plateau, _ = rehearsal.check_curve(accs, threshold=95.0)
    assert not ok and plateau < 95.0


def test_corpus_image_deterministic_and_class_separated():
    rng1 = np.random.default_rng(1234)
    rng2 = np.random.default_rng(1234)
    a = rehearsal._make_image(rng1, 7)
    b = rehearsal._make_image(rng2, 7)
    assert a.dtype == np.uint8 and a.shape == (rehearsal.SRC_SIZE, rehearsal.SRC_SIZE, 3)
    assert (a == b).all()
    # a different hue family differs grossly in mean color
    c = rehearsal._make_image(np.random.default_rng(1234), 7 + rehearsal.N_TEX * 10)
    assert abs(a.astype(int).mean(axis=(0, 1)) - c.astype(int).mean(axis=(0, 1))).max() > 10


def test_recipe_table_complete():
    for name, r in rehearsal.RECIPES.items():
        assert os.path.exists(os.path.join(os.path.dirname(__file__), "..", "configs", r["config"])), name
        assert r["epochs"] > 0 and len(r["cos_lr"]) == 2
        if r["warm_frac"] > 0:
            assert len(r["warm_lr"]) == 2
