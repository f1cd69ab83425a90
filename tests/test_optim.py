"""Optimizer parity: torch oracles for sgd/adamw, numpy oracles implementing
the reference formulas (reference optimizers.py) for the experimental zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.optim.factory import agc
from sota_imagenet_tpu.utils.misc import filter_from_weight_decay

LR = 0.1


def _run_jax(tx, params0, grads_seq):
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    for g in grads_seq:
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        updates, state = tx.update(gj, state, params)
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
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-2}, LR)
    got = _run_jax(tx, params0, grads)
    want = _run_torch(torch.optim.SGD, params0, grads, lr=LR, momentum=0.9, weight_decay=1e-2)
    for k in params0:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch():
    params0, grads = _toy_problem()
    tx = build_optimizer({"_target_": "adamw", "weight_decay": 1e-2, "eps": 1e-8}, 0.01)
    got = _run_jax(tx, params0, grads)
    want = _run_torch(torch.optim.AdamW, params0, grads, lr=0.01, weight_decay=1e-2, eps=1e-8)
    for k in params0:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6)


def test_novograd_matches_reference_formula():
    """Oracle follows reference NovogradApex (optimizers.py:234-290)."""
    params0, grads = _toy_problem()
    b1, b2, eps, wd, init = 0.95, 0.5, 1e-8, 1e-2, 1e-3
    tx = build_optimizer(
        {"_target_": "NovogradApex", "betas": [b1, b2], "eps": eps, "weight_decay": wd, "ema_norm_init": init}, LR
    )
    got = _run_jax(tx, params0, grads)
    # numpy oracle
    p = {k: v.copy() for k, v in params0.items()}
    m = {k: np.zeros_like(v) for k, v in params0.items()}
    v2 = {k: init for k in params0}
    for g in grads:
        for k in p:
            v2[k] = b2 * v2[k] + (1 - b2) * np.sum(g[k] ** 2)
            denom = np.sqrt(v2[k]) + eps
            m[k] = b1 * m[k] + (1 - b1) * g[k] / denom
            p[k] = p[k] - LR * m[k]
            p[k] = p[k] * (1 - LR * wd)
    for k in params0:
        np.testing.assert_allclose(got[k], p[k], rtol=1e-5, atol=1e-6)


def test_novograd_wd_eps_deadzone():
    params0 = {"w": np.asarray([[0.5, 1e-4]], np.float32)}
    grads = [{"w": np.zeros((1, 2), np.float32)}]
    tx = build_optimizer({"_target_": "novograd", "weight_decay": 0.5, "wd_eps": 1e-2}, 1.0)
    got = _run_jax(tx, params0, grads)
    # |w| < wd_eps -> no decay; larger weights decay toward eps
    assert got["w"][0, 1] == np.float32(1e-4)
    assert got["w"][0, 0] < 0.5


def test_adam_layerwise_matches_reference_formula():
    """Oracle follows reference AdamLayerwise (optimizers.py:334-397)."""
    params0, grads = _toy_problem()
    b1, b2, eps, wd, init = 0.95, 0.5, 1e-6, 1e-2, 1e-3
    tx = build_optimizer(
        {"_target_": "AdamLayerwise", "betas": [b1, b2], "eps": eps, "weight_decay": wd, "ema_norm_init": init}, LR
    )
    got = _run_jax(tx, params0, grads)
    p = {k: v.copy() for k, v in params0.items()}
    m = {k: np.zeros_like(v) for k, v in params0.items()}
    v2 = {k: init for k in params0}
    for g in grads:
        for k in p:
            v2[k] = b2 * v2[k] + (1 - b2) * np.mean(g[k] ** 2)
            denom = np.sqrt(v2[k]) + eps
            m[k] = b1 * m[k] + (1 - b1) * g[k] / denom
            p[k] = p[k] - LR * m[k]
            p[k] = p[k] * (1 - LR * wd)
    for k in params0:
        np.testing.assert_allclose(got[k], p[k], rtol=1e-5, atol=1e-6)


def test_adai_matches_reference_formula():
    """Oracle follows reference MyAdai per_layer=True (optimizers.py:445-519):
    global v-mean computed from the PREVIOUS step's EMAs."""
    params0, grads = _toy_problem(steps=4)
    b0, b2, eps, wd, init = 0.1, 0.9, 1e-3, 1e-2, 1e-3
    tx = build_optimizer(
        {"_target_": "MyAdai", "betas": [b0, b2], "eps": eps, "weight_decay": wd, "ema_norm_init": init}, LR
    )
    got = _run_jax(tx, params0, grads)
    p = {k: v.copy() for k, v in params0.items()}
    m = {k: np.zeros_like(v) for k, v in params0.items()}
    v2 = {k: init for k in params0}
    first = True
    for g in grads:
        v_mean = init if first else sum(v2.values()) / len(v2)
        first = False
        for k in p:
            v2[k] = b2 * v2[k] + (1 - b2) * np.mean(g[k] ** 2)
            beta1 = np.clip(1 - (v2[k] / v_mean) * b0, 0, 1 - eps)
            m[k] = beta1 * m[k] + (1 - beta1) * g[k]
            p[k] = p[k] - LR * m[k]
            p[k] = p[k] * (1 - LR * wd)
    for k in params0:
        np.testing.assert_allclose(got[k], p[k], rtol=1e-5, atol=1e-6)


def test_madgrad_matches_reference_formula():
    """Oracle follows reference MADGRAD w/ decoupled wd (optimizers.py:709-770)."""
    params0, grads = _toy_problem(steps=4)
    mom, wd, eps = 0.9, 1e-3, 1e-6
    tx = build_optimizer({"_target_": "MADGRAD", "momentum": mom, "weight_decay": wd, "eps": eps}, LR)
    got = _run_jax(tx, params0, grads)
    p = {k: v.copy() for k, v in params0.items()}
    x0 = {k: v.copy() for k, v in params0.items()}
    gss = {k: np.zeros_like(v) for k, v in params0.items()}
    s = {k: np.zeros_like(v) for k, v in params0.items()}
    ck = 1 - mom
    for k_step, g in enumerate(grads):
        lamb = (LR + eps) * np.sqrt(k_step + 1)
        for k in p:
            gss[k] = gss[k] + lamb * g[k] ** 2
            rms = np.cbrt(gss[k]) + eps
            s[k] = s[k] + lamb * g[k]
            z = x0[k] - s[k] / rms
            p[k] = (1 - ck) * p[k] + ck * z
            p[k] = p[k] * (1 - wd)
    for k in params0:
        np.testing.assert_allclose(got[k], p[k], rtol=1e-4, atol=1e-6)


def test_adais_runs_and_decays():
    params0, grads = _toy_problem(steps=3)
    tx = build_optimizer({"_target_": "AdaiS", "weight_decay": 1e-2}, LR)
    got = _run_jax(tx, params0, grads)
    for k in params0:
        assert np.isfinite(got[k]).all()
        assert not np.allclose(got[k], params0[k])


def test_adamp_projection_runs():
    params0, grads = _toy_problem(steps=3)
    tx = build_optimizer({"_target_": "adamp.AdamP", "weight_decay": 1e-2}, 0.01)
    got = _run_jax(tx, params0, grads)
    for k in params0:
        assert np.isfinite(got[k]).all()


def test_badam_lamb_mode():
    params0, grads = _toy_problem(steps=2)
    tx = build_optimizer({"_target_": "badam.BAdam", "lamb": True, "weight_decay": 5e-3, "eps": 1e-6}, 0.01)
    got = _run_jax(tx, params0, grads)
    for k in params0:
        assert np.isfinite(got[k]).all()


def test_agc_clips_large_grads():
    params = {"w": jnp.ones((4, 8)) * 0.1}
    big = {"w": jnp.ones((4, 8)) * 100.0}
    small = {"w": jnp.ones((4, 8)) * 1e-4}
    clip = agc(clipping=0.01)
    out_big = clip(big, params)["w"]
    out_small = clip(small, params)["w"]
    assert float(jnp.max(jnp.abs(out_big))) < 1.0  # clipped hard
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(small["w"]))  # untouched


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
    tx = build_optimizer({"_target_": "sgd", "weight_decay": 0.1}, 1.0, wd_mask=mask)
    got = _run_jax(tx, params0, grads)
    assert np.all(got["w"] < 1.0)  # decayed
    assert np.all(got["gain"] == 1.0)  # masked out


def test_zoo_wd_mask_applied():
    params0 = {"w": np.ones((2, 2), np.float32), "gain": np.ones((2, 2), np.float32)}
    grads = [{"w": np.zeros((2, 2), np.float32), "gain": np.zeros((2, 2), np.float32)}] * 2
    mask = {"w": True, "gain": False}
    for target in ["novograd", "adam_layerwise", "adai", "madgrad"]:
        tx = build_optimizer({"_target_": target, "weight_decay": 0.5}, 0.5, wd_mask=mask)
        got = _run_jax(tx, params0, grads)
        assert np.all(got["gain"] == 1.0), target
        assert np.all(got["w"] < 1.0), target


def test_reference_alias_names():
    for target in [
        "torch.optim._multi_tensor.SGD",
        "pytorch_tools.optim.adamw.AdamW",
        "apex.optimizers.FusedNovoGrad",
        "src.optimizers.MADGRAD",
    ]:
        tx = build_optimizer({"_target_": target, "weight_decay": 0.0}, 0.1)
        assert tx is not None


def test_rmsprop_matches_torch():
    params0, grads = _toy_problem()
    for kw in [
        {"alpha": 0.9, "eps": 1e-3, "weight_decay": 1e-5, "momentum": 0.9},
        {"alpha": 0.99, "eps": 1e-8, "weight_decay": 0.0, "momentum": 0.0},
        {"alpha": 0.95, "eps": 1e-4, "weight_decay": 1e-4, "momentum": 0.5, "centered": True},
    ]:
        tx = build_optimizer({"_target_": "rmsprop", **kw}, 0.01)
        got = _run_jax(tx, params0, grads)
        want = _run_torch(torch.optim.RMSprop, params0, grads, lr=0.01, **kw)
        for k in params0:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-6, err_msg=str(kw))


def test_sgdp_matches_official_formula():
    """Numpy oracle of the official clovaai/adamp SGDP step (channel view),
    written in OUR layout convention (output axis last)."""
    params0, grads = _toy_problem(steps=4)
    lr, momentum, wd, delta, wd_ratio, eps = 0.1, 0.9, 1e-2, 0.1, 0.1, 1e-8

    p = {k: v.copy().astype(np.float64) for k, v in params0.items()}
    buf = {k: np.zeros_like(v) for k, v in p.items()}
    for g in grads:
        for k in p:
            gk = g[k].astype(np.float64)
            buf[k] = momentum * buf[k] + gk
            d_p = buf[k]
            ratio = 1.0
            if p[k].ndim > 1:
                pv = p[k].reshape(-1, p[k].shape[-1]).T
                gv = gk.reshape(-1, gk.shape[-1]).T
                sv = d_p.reshape(-1, d_p.shape[-1]).T
                pn = pv / (np.linalg.norm(pv, axis=1, keepdims=True) + 1e-8)
                gn = gv / (np.linalg.norm(gv, axis=1, keepdims=True) + 1e-8)
                cos = np.abs(np.sum(pn * gn, axis=1))
                if cos.max() < delta / np.sqrt(pv.shape[1]):
                    p_n = pv / (np.linalg.norm(pv, axis=1, keepdims=True) + eps)
                    sv = sv - p_n * np.sum(sv * p_n, axis=1, keepdims=True)
                    ratio = wd_ratio
                d_p = sv.T.reshape(p[k].shape)
            p[k] = p[k] * (1 - lr * wd * ratio / (1 - momentum)) - lr * d_p

    tx = build_optimizer({"_target_": "sgdp", "momentum": momentum, "weight_decay": wd}, lr)
    got = _run_jax(tx, params0, grads)
    for k in params0:
        np.testing.assert_allclose(got[k], p[k], rtol=1e-4, atol=1e-6)


def test_lookahead_sync_semantics():
    """After k fast steps the params must land at slow + alpha*(fast - slow);
    between syncs they must exactly track the inner optimizer."""
    k, alpha, lr = 3, 0.5, 0.1
    params0, grads = _toy_problem(steps=6)

    plain = _run_jax(build_optimizer({"_target_": "sgd"}, lr), params0, grads[:2])
    tx = build_optimizer({"_target_": "sgd", "lookahead": True, "lookahead_k": k, "lookahead_alpha": alpha}, lr)
    wrapped2 = _run_jax(tx, params0, grads[:2])
    for key in params0:
        np.testing.assert_allclose(wrapped2[key], plain[key], rtol=1e-6)

    # numpy oracle over all 6 steps (two syncs at steps 3 and 6)
    p = {key: v.copy().astype(np.float64) for key, v in params0.items()}
    slow = {key: v.copy().astype(np.float64) for key, v in params0.items()}
    for i, g in enumerate(grads):
        for key in p:
            p[key] = p[key] - lr * g[key]
        if (i + 1) % k == 0:
            for key in p:
                slow[key] = slow[key] + alpha * (p[key] - slow[key])
                p[key] = slow[key].copy()
    got = _run_jax(tx, params0, grads)
    for key in params0:
        np.testing.assert_allclose(got[key], p[key], rtol=1e-5, atol=1e-7)


def test_legacy_optimizer_aliases():
    for target in ["fused_sgd", "fused_adam", "fused_novograd", "sgdp", "rmsprop"]:
        tx = build_optimizer({"_target_": target}, 0.1)
        assert tx is not None
