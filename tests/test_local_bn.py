"""Local/grouped BatchNorm statistics (run.bn_stats).

The reference's BN is DDP per-GPU local stats (reference train.py:114 — all
its published accuracies, incl. the 77.1% target, were trained that way).
Here the grouped view is a reshape + per-group reductions (norms._BNCore):
these tests pin (1) bit-level equivalence with running DDP's BN on each shard
separately, (2) that 'global' stays the untouched sync-BN path, and (3) that
'local' removes the BN all-reduces from the compiled 8-device step.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.models import norms as N

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _init_and_apply(mod, x, train=True):
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    y, updated = mod.apply(variables, x, train=train, mutable=["batch_stats"])
    return y, updated["batch_stats"], variables


def test_grouped_bn_equals_per_group_loop():
    """groups=4 on a batch of 8 must reproduce running plain (global) BN on
    each group of 2 separately — the exact DDP-local-BN semantics."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (8, 6, 6, 5)).astype(np.float32))
    grouped = N.BatchNorm(stats_groups=4, dtype=jnp.float32)
    y_g, bs_g, variables = _init_and_apply(grouped, x)

    single = N.BatchNorm(stats_groups=1, dtype=jnp.float32)
    v1 = single.init(jax.random.PRNGKey(0), x[:2], train=False)
    outs, means, varis = [], [], []
    for g in range(4):
        y, upd = single.apply(v1, x[2 * g : 2 * g + 2], train=True, mutable=["batch_stats"])
        outs.append(np.asarray(y))
        st = jax.tree_util.tree_leaves(upd["batch_stats"])
        # flax stores EMA'd stats; recover the batch stats from momentum 0.1
        # applied to the zero/one init: new = 0.9*init + 0.1*batch
        means.append((np.asarray(upd["batch_stats"]["BatchNorm_0"]["mean"]) - 0.0) / 0.1)
        varis.append((np.asarray(upd["batch_stats"]["BatchNorm_0"]["var"]) - 0.9 * 1.0) / 0.1)
    np.testing.assert_allclose(np.asarray(y_g), np.concatenate(outs), rtol=1e-6, atol=1e-6)
    # grouped running stats EMA the group-AVERAGED batch stats
    exp_mean = 0.9 * 0.0 + 0.1 * np.mean(means, axis=0)
    exp_var = 0.9 * 1.0 + 0.1 * np.mean(varis, axis=0)
    np.testing.assert_allclose(np.asarray(bs_g["BatchNorm_0"]["mean"]), exp_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bs_g["BatchNorm_0"]["var"]), exp_var, rtol=1e-5, atol=1e-6)


def test_global_path_is_untouched_flax_bn():
    """stats_groups=1 (the default) must still be flax nn.BatchNorm exactly —
    same tree layout, same numbers."""
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 2.0, (4, 5, 5, 3)).astype(np.float32))
    ours = N.BatchNorm(dtype=jnp.float32)
    y_o, bs_o, _ = _init_and_apply(ours, x)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    y_r, upd = ref.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_o), np.asarray(y_r))
    np.testing.assert_array_equal(
        np.asarray(bs_o["BatchNorm_0"]["mean"]), np.asarray(upd["batch_stats"]["mean"])
    )


def test_grouped_abn_matches_grouped_bn_plus_act():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1.5, (8, 4, 4, 3)).astype(np.float32))
    abn = N.ABN(activation="leaky_relu", stats_groups=2, dtype=jnp.float32)
    y_a, _, _ = _init_and_apply(abn, x)
    bn = N.BatchNorm(stats_groups=2, dtype=jnp.float32)
    y_b, _, _ = _init_and_apply(bn, x)
    np.testing.assert_allclose(np.asarray(y_a), jax.nn.leaky_relu(np.asarray(y_b), 0.01), rtol=1e-6)


def test_process_default_threading():
    """BatchNorm with stats_groups=None reads the process-wide setting at
    trace time (how run.bn_stats reaches config-built models)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 4, 4, 3)).astype(np.float32))
    try:
        N.set_bn_stats_groups(4)
        y_def, _, _ = _init_and_apply(N.BatchNorm(dtype=jnp.float32), x)
    finally:
        N.set_bn_stats_groups(1)
    y_4, _, _ = _init_and_apply(N.BatchNorm(stats_groups=4, dtype=jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(y_def), np.asarray(y_4))
    assert N.resolve_bn_stats("global", 8) == 1
    assert N.resolve_bn_stats("local", 8) == 8
    assert N.resolve_bn_stats(4, 8) == 4
    with pytest.raises(ValueError):
        N.resolve_bn_stats(0, 8)


def test_indivisible_batch_raises():
    x = jnp.zeros((6, 4, 4, 3), jnp.float32)
    mod = N.BatchNorm(stats_groups=4, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="must divide"):
        mod.apply(v, x, train=True, mutable=["batch_stats"])


def _count_all_reduces(compiled_text: str) -> int:
    return len(re.findall(r"\ball-reduce(?:-start)?\b", compiled_text))


def test_local_bn_removes_collectives_from_sharded_step(mesh8):
    """Compile the train step over the 8-device mesh with global vs local BN
    stats and count all-reduce ops in the optimized HLO: 'local' must remove
    the per-BN-layer statistics all-reduces, leaving (roughly) the gradient
    reduction only."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    def build(groups):
        return CModel(
            layer_config=[
                {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
                {"module": "BatchNorm2d", "args": [8], "kwargs": {"stats_groups": groups}},
                {"module": "ReLU"},
                {"module": "conv3x3", "args": [8, 8]},
                {"module": "BatchNorm2d", "args": [8], "kwargs": {"stats_groups": groups}},
                {"module": "ReLU"},
                {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
                {"module": "Linear", "args": [8, 10]},
            ]
        )

    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    counts = {}
    sh, rep = batch_sharding(mesh8), replicate(mesh8)
    for name, groups in (("global", 1), ("local", 8)):
        model = build(groups)
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
        state = steps_lib.init_state(model, tx, (8, 16, 16, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
        step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))
        batch = {
            "image": jax.device_put(jnp.zeros((16, 16, 16, 3), jnp.float32), sh),
            "label": jax.device_put(jax.nn.one_hot(jnp.arange(16) % 10, 10), sh),
        }
        state = jax.device_put(state, rep)
        compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        counts[name] = _count_all_reduces(compiled.as_text())
    # global: >= 2 BN layers x (fwd stats + bwd stats) + grad reduction;
    # local: BN stats all device-local, only the gradient all-reduce remains
    assert counts["local"] < counts["global"], counts
    assert counts["global"] - counts["local"] >= 2, counts
