"""Every optimizer in the zoo must run inside the full jitted train step and
actually move the parameters (zoo ↔ TrainState integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train import steps as steps_lib

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

OPTIMS = [
    {"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4},
    {"_target_": "adamw", "weight_decay": 1e-3},
    {"_target_": "lamb", "weight_decay": 1e-3},
    {"_target_": "badam", "lamb": True, "weight_decay": 1e-3},
    {"_target_": "novograd", "weight_decay": 1e-3},
    {"_target_": "novograd", "weight_decay": 1e-3, "wd_eps": 0.01, "unitwise": True},
    {"_target_": "adam_layerwise", "weight_decay": 1e-3, "weight_adapt": True, "stable_wd": True},
    {"_target_": "adai", "weight_decay": 1e-4},
    {"_target_": "adai", "weight_decay": 1e-4, "sgd_mom": True, "sqrt_mom": True, "per_layer": False},
    {"_target_": "adais", "weight_decay": 1e-4},
    {"_target_": "madgrad", "weight_decay": 1e-4},
    {"_target_": "adamp", "weight_decay": 1e-3},
]


@pytest.mark.parametrize("optim_cfg", OPTIMS, ids=[f"{o['_target_']}{i}" for i, o in enumerate(OPTIMS)])
def test_optimizer_in_full_step(optim_cfg):
    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "BatchNorm2d", "args": [8]},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 10]},
        ]
    )
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.01, jnp.float32)
    mask = None
    tx = build_optimizer(dict(optim_cfg), sched, wd_mask=mask)
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3)),
        "label": jax.nn.one_hot(jnp.arange(8) % 10, 10),
    }
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for _ in range(3):
        state, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss"])), optim_cfg
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(p0))
    )
    assert moved, optim_cfg
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all(), optim_cfg
