import math

import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.config import parse_stages
from sota_imagenet_tpu.train.schedule import make_lr_schedule, phases_from_stages


def test_r50_baseline_phases():
    """Warmup 0→8 linear 0.001→1.0 then cos 8→90 1.0→0
    (reference 1.r50_baseline.yaml:38-41)."""
    stages = parse_stages(
        [dict(start=0, end=8, lr=[0.001, 1.0]), dict(start=8, end=90, lr=[1.0, 0], lr_mode="cos")]
    )
    phases = phases_from_stages(stages)
    spe = 100
    sched = make_lr_schedule(phases, spe)
    assert np.isclose(float(sched(0)), 0.001)
    assert np.isclose(float(sched(4 * spe)), (0.001 + 1.0) / 2, atol=1e-3)
    assert np.isclose(float(sched(8 * spe)), 1.0, atol=1e-3)
    # cosine midpoint at epoch 49
    mid = 0.5 * (1 + math.cos(math.pi * 0.5))
    assert np.isclose(float(sched(49 * spe)), mid, atol=1e-2)
    assert float(sched(90 * spe)) < 1e-3


def test_lr_only_stage_skipped():
    stages = parse_stages([dict(start=0, end=10, lr=None, extra_args=dict(image_size=128)), dict(start=10, end=20, lr=[0.5, 0])])
    phases = phases_from_stages(stages)
    assert len(phases) == 1 and phases[0]["ep"] == (10, 20)


def test_base_anchor():
    phases = [dict(ep=(0, 10), lr=(1.0, 0.0), mode="linear")]
    # stage 2 resumes at epoch 5 with different steps_per_epoch
    sched = make_lr_schedule(phases, steps_per_epoch=50, base_epoch=5, base_step=1000)
    assert np.isclose(float(sched(1000)), 0.5)
    assert np.isclose(float(sched(1000 + 5 * 50)), 0.0, atol=1e-6)
