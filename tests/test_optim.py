"""Optimizer parity vs torch (cpu) reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.utils.misc import filter_from_weight_decay


def _run_jax(tx, params0, grads_seq, lr):
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    for g in grads_seq:
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        updates, state = tx.update(gj, state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
    return {k: np.asarray(v) for k, v in params.items()}


def _run_torch(opt_cls, params0, grads_seq, **kw):
    tp = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params0.items()}
    opt = opt_cls(list(tp.values()), **kw)
    keys = list(tp.keys())
    for g in grads_seq:
        opt.zero_grad()
        for k in keys:
            tp[k].grad = torch.tensor(g[k])
        opt.step()
    return {k: tp[k].detach().numpy() for k in keys}


def _toy_problem(seed=0, steps=5):
    rng = np.random.default_rng(seed)
    params0 = {"w": rng.standard_normal((4, 3)).astype(np.float32), "b": rng.standard_normal(3).astype(np.float32)}
    grads = [
        {"w": rng.standard_normal((4, 3)).astype(np.float32), "b": rng.standard_normal(3).astype(np.float32)}
        for _ in range(steps)
    ]
    return params0, grads


def test_sgd_matches_torch():
    params0, grads = _toy_problem()
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-2})
    got = _run_jax(tx, params0, grads, lr=0.1)
    want = _run_torch(torch.optim.SGD, params0, grads, lr=0.1, momentum=0.9, weight_decay=1e-2)
    for k in params0:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch():
    params0, grads = _toy_problem()
    tx = build_optimizer({"_target_": "adamw", "weight_decay": 1e-2, "eps": 1e-8})
    got = _run_jax(tx, params0, grads, lr=0.01)
    want = _run_torch(torch.optim.AdamW, params0, grads, lr=0.01, weight_decay=1e-2, eps=1e-8)
    for k in params0:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6)


def test_wd_mask_excludes_gain_and_1d():
    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)}, "gain_layer": {"gain": jnp.zeros((8, 1))}}
    mask = filter_from_weight_decay(params, ["gain"])
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False  # ndim <= 1
    assert mask["gain_layer"]["gain"] is False  # name match


def test_sgd_wd_mask_applied():
    params0 = {"w": np.ones((2, 2), np.float32), "gain": np.ones((2, 2), np.float32)}
    grads = [{"w": np.zeros((2, 2), np.float32), "gain": np.zeros((2, 2), np.float32)}]
    mask = {"w": True, "gain": False}
    tx = build_optimizer({"_target_": "sgd", "weight_decay": 0.1}, wd_mask=mask)
    got = _run_jax(tx, params0, grads, lr=1.0)
    assert np.all(got["w"] < 1.0)  # decayed
    assert np.all(got["gain"] == 1.0)  # masked out


def test_reference_alias_names():
    for target in ["torch.optim._multi_tensor.SGD", "pytorch_tools.optim.adamw.AdamW"]:
        tx = build_optimizer({"_target_": target, "weight_decay": 0.0})
        assert tx is not None
