"""Numpy-oracle tests for the norm zoo math (reference model.py:256-383
formulas, translated NCHW->NHWC)."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.models.norms import FRNv1, FRNv2, VarEMA


def test_frnv1_train_forward_oracle():
    """frn_v1_train_forward (reference model.py:256-264): x2 = mean(x^2) per
    channel over (N,H,W); y = x*rsqrt(x2+eps)*clamp(sqrt((x2+eps)/run),1/5,5);
    running lerp with momentum."""
    eps, mom = 1e-5, 0.95
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2.0, (4, 3, 3, 6)).astype(np.float32)
    norm = FRNv1(eps=eps, momentum=mom)
    variables = norm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y, upd = norm.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])

    x2 = (x.astype(np.float64) ** 2).mean(axis=(0, 1, 2))
    run0 = np.ones(6)
    # reference updates the running RMS FIRST, then renorms against the
    # updated value (model.py:260-263)
    expected_run = mom * run0 + (1 - mom) * x2
    r = np.clip(np.sqrt((x2 + eps) / expected_run), 1 / 5, 5)
    expected_y = x / np.sqrt(x2 + eps) * r  # weight=1, bias=0 at init

    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["running_var"]), expected_run, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), expected_y, rtol=1e-4, atol=1e-5)


def test_frnv1_eval_uses_running():
    norm = FRNv1(eps=1e-5)
    x = jnp.ones((2, 2, 2, 4)) * 3.0
    variables = norm.init(jax.random.PRNGKey(0), x, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": {"running_var": jnp.full((4,), 9.0)},
    }
    y = norm.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 3.0 / np.sqrt(9.0 + 1e-5), rtol=1e-5)


def test_varema_oracle():
    """VarEMA train (reference model.py:361-375, effective scalar stats):
    y = x/(std+eps)*clamp(std/std_ema,1/5,5); std_ema lerp."""
    eps, decay = 1e-4, 0.9
    rng = np.random.default_rng(1)
    x = rng.normal(0, 3.0, (2, 4, 4, 3)).astype(np.float32)
    v = VarEMA(decay=decay, eps=eps)
    variables = v.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y, upd = v.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    std = x.std()
    new_ema = decay * 1.0 + (1 - decay) * std  # updated BEFORE renorm (model.py:368-375)
    r = np.clip(std / new_ema, 1 / 5, 5)
    np.testing.assert_allclose(np.asarray(y), x / (std + eps) * r, rtol=1e-4)
    np.testing.assert_allclose(float(upd["batch_stats"]["std_ema"]), new_ema, rtol=1e-5)
    # eval divides by the running std
    y_eval = v.apply({"params": {}, "batch_stats": upd["batch_stats"]}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_eval), x / float(upd["batch_stats"]["std_ema"]), rtol=1e-4)


def test_frnv2_eval_formula():
    """frn_val_forward (reference model.py:311-314): x * rsqrt(srv+eps) *
    rsqrt(rv+eps) * w + b."""
    norm = FRNv2(eps=1e-5)
    x = jnp.ones((1, 2, 2, 3)) * 2.0
    variables = norm.init(jax.random.PRNGKey(0), x, train=False)
    bs = {"single_running_var": jnp.asarray(4.0), "running_var": jnp.full((3,), 16.0)}
    y = norm.apply({"params": variables["params"], "batch_stats": bs}, x, train=False)
    expect = 2.0 / np.sqrt(4.0 + 1e-5) / np.sqrt(16.0 + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)


def test_training_reproducible_from_seed():
    """Identical seeds -> identical parameter trajectories (the functional-RNG
    upgrade over the reference's stateful DALI randomness)."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib

    def run():
        model = CModel(
            layer_config=[
                {"module": "conv3x3", "args": [3, 8]},
                {"module": "ReLU"},
                {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
                {"module": "Linear", "args": [8, 10]},
            ]
        )
        crit = CrossEntropyLoss()
        sched = lambda s: jnp.asarray(0.1, jnp.float32)
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
        rng = jax.random.PRNGKey(123)
        step = steps_lib.build_train_step(
            model, crit, tx, sched, input_dtype=jnp.float32,
            mixup_fn=lambda k, i, l: steps_lib.cutmix_mixup(k, i, l, 1.0, 0.2, 1.0),
        )
        state = steps_lib.init_state(model, tx, (2, 8, 8, 3), rng)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(5), (8, 8, 8, 3)),
            "label": jax.nn.one_hot(jnp.arange(8) % 10, 10),
        }
        for _ in range(4):
            state, _ = step(state, batch, rng)
        return state

    s1, s2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
