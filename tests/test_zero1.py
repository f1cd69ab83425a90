"""ZeRO-1 optimizer-state sharding (mesh.zero1).

Beyond the reference's pure DDP (everything replicated, reference
train.py:114): optimizer-state leaves are sharded over the 'data' axis along
their largest divisible dim; XLA partitions the update math per shard and
gathers applied updates. These tests pin (1) identical numerics vs the
replicated baseline, (2) that the sharding SURVIVES the jitted step (the
memory win persists across steps, not just at placement), and (3) the
spec-selection rules."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.parallel.mesh import apply_zero1, batch_sharding, replicate, zero1_opt_sharding
from sota_imagenet_tpu.train import steps as steps_lib
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _setup(mesh, optim):
    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 16], "kwargs": {"stride": 2}},
            {"module": "BatchNorm2d", "args": [16]},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [16, 10]},
        ]
    )
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer(optim, sched)
    state = steps_lib.init_state(model, tx, (2, 16, 16, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))
    batch = {
        "image": jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3)), batch_sharding(mesh)),
        "label": jax.device_put(jax.nn.one_hot(jnp.arange(16) % 10, 10), batch_sharding(mesh)),
    }
    return state, step, batch


def test_zero1_matches_replicated(mesh8):
    for optim in ({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, {"_target_": "adamw", "weight_decay": 1e-2}):
        state, step, batch = _setup(mesh8, optim)
        rng = jax.random.PRNGKey(2)

        s_rep = jax.device_put(state, replicate(mesh8))
        s_z = apply_zero1(jax.device_put(state, replicate(mesh8)), mesh8)
        for _ in range(3):
            s_rep, m_rep = step(s_rep, batch, rng)
            s_z, m_z = step(s_z, batch, rng)
        np.testing.assert_allclose(float(m_rep["loss"]), float(m_z["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_rep.params), jax.tree_util.tree_leaves(s_z.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s_rep.opt_state), jax.tree_util.tree_leaves(s_z.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_zero1_sharding_survives_steps(mesh8):
    state, step, batch = _setup(mesh8, {"_target_": "adamw", "weight_decay": 1e-2})
    s_z = apply_zero1(jax.device_put(state, replicate(mesh8)), mesh8)

    def sharded_leaves(opt_state):
        return [
            leaf
            for leaf in jax.tree_util.tree_leaves(opt_state)
            if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
        ]

    n0 = len(sharded_leaves(s_z.opt_state))
    assert n0 > 0, "no opt-state leaf got sharded"
    rng = jax.random.PRNGKey(3)
    for _ in range(2):
        s_z, _ = step(s_z, batch, rng)
    n2 = len(sharded_leaves(s_z.opt_state))
    assert n2 >= n0, f"ZeRO-1 sharding lost in the step: {n0} -> {n2} sharded leaves"
    # the memory win is real: each device holds 1/8 of a sharded leaf
    leaf = sharded_leaves(s_z.opt_state)[0]
    assert max(s.data.nbytes for s in leaf.addressable_shards) == leaf.nbytes // 8


def test_zero1_spec_rules(mesh8):
    tree = {
        "mom_conv": jnp.zeros((3, 3, 16, 16)),  # 16 divisible -> sharded on a 16-dim
        "scalar": jnp.zeros(()),  # replicated
        "odd": jnp.zeros((3, 5)),  # no divisible dim -> replicated
        "count": jnp.zeros((1,), jnp.int32),  # replicated
    }
    specs = zero1_opt_sharding(mesh8, tree)
    assert specs["mom_conv"].spec == jax.sharding.PartitionSpec(None, None, "data", None)
    assert specs["scalar"].spec == jax.sharding.PartitionSpec()
    assert specs["odd"].spec == jax.sharding.PartitionSpec()
    assert specs["count"].spec == jax.sharding.PartitionSpec()
