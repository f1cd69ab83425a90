"""run.skip_nonfinite — the bf16 analog of AMP's grad-scaler step skip.

The reference trains fp16 under torch.cuda.amp: scaler.step() SKIPS the
optimizer step when the scaled grads contain inf/NaN (reference
callbacks.py:308-309 relies on this). bf16 needs no scaler, but without one
a single non-finite gradient permanently NaNs the params (found live: the
NFNet rehearsal recipe at an over-scaled lr — PERF.md round 4).
`run.skip_nonfinite: N` wraps the optimizer in optax.apply_if_finite so up
to N consecutive bad steps are dropped while sustained divergence still
surfaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sota_imagenet_tpu.config import parse_stages
from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train import steps as steps_lib
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.schedule import phases_from_stages

from tests.test_train import tiny_model


def _runner(skip_n):
    def tx_factory(sched):
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
        if skip_n:
            tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_n)
        return tx

    stages = parse_stages([dict(start=0, end=2, lr=[0.1, 0.1])])
    return Runner(
        tiny_model(),
        CrossEntropyLoss(smoothing=0.1),
        tx_factory,
        lr_phases=phases_from_stages(stages),
        input_dtype=jnp.float32,
    )


def _batch(bs=8, poison=False):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(bs, 16, 16, 3)).astype(np.float32)
    if poison:
        img[0, 0, 0, 0] = np.inf  # -> non-finite loss -> non-finite grads
    lab = jax.nn.one_hot(np.arange(bs) % 10, 10, dtype=jnp.float32)
    return {"image": jnp.asarray(img), "label": lab}


def _leaf0(params):
    return np.asarray(jax.tree_util.tree_leaves(params)[0])


def _any_nonfinite(params):
    # NaN propagation is leaf-dependent (a BN bias can stay finite at 0 while
    # the conv/dense kernels go NaN) — check the whole tree, not one leaf.
    return any(
        not np.all(np.isfinite(np.asarray(leaf)))
        for leaf in jax.tree_util.tree_leaves(params)
    )


def test_poisoned_step_skipped_then_recovers():
    runner = _runner(skip_n=3)
    runner.init_state((8, 16, 16, 3))
    runner._build_steps(steps_per_epoch=4, base_epoch=0)
    rng = jax.random.PRNGKey(0)
    p0 = _leaf0(runner.state.params)

    runner.state, m = runner._train_step(runner.state, _batch(poison=True), rng)
    assert not np.isfinite(float(m["loss"]))  # the bad step is visible
    np.testing.assert_array_equal(_leaf0(runner.state.params), p0)  # but not applied
    opt = runner.state.opt_state
    assert int(opt.notfinite_count) == 1 and not bool(opt.last_finite)

    runner.state, m = runner._train_step(runner.state, _batch(poison=False), rng)
    assert np.isfinite(float(m["loss"]))
    assert not np.array_equal(_leaf0(runner.state.params), p0)  # training resumed
    opt = runner.state.opt_state
    assert int(opt.notfinite_count) == 0 and int(opt.total_notfinite) == 1


def test_without_skip_params_go_nan():
    runner = _runner(skip_n=0)
    runner.init_state((8, 16, 16, 3))
    runner._build_steps(steps_per_epoch=4, base_epoch=0)
    rng = jax.random.PRNGKey(0)
    runner.state, _ = runner._train_step(runner.state, _batch(poison=True), rng)
    # without the guard one bad step is permanent (what the NFNet probe hit)
    assert _any_nonfinite(runner.state.params)


def test_sustained_divergence_gives_up():
    # after N consecutive skips the update is accepted (divergence must
    # surface rather than being silently masked forever)
    runner = _runner(skip_n=2)
    runner.init_state((8, 16, 16, 3))
    runner._build_steps(steps_per_epoch=8, base_epoch=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(4):
        runner.state, _ = runner._train_step(runner.state, _batch(poison=True), rng)
    assert _any_nonfinite(runner.state.params)


def test_config_schema_default():
    from sota_imagenet_tpu.config import RunnerConfig

    assert RunnerConfig().skip_nonfinite == 0
