"""A/B the r50 train step with a custom scatter-free max-pool backward vs
XLA's plain reduce_window/select_and_scatter, in ONE process (same chip
session) so chip-state variance can't confound the comparison.

VERDICT (measured 2026-08-18, v5-lite chip, bs 128 @ 224): the custom
backward LOSES — 64.8 ms/step (1,976 img/s) vs 48.5 ms/step (2,641 img/s)
for plain select_and_scatter; standalone VGG-shape pools were up to 37x
slower (the (n,h/2,2,w/2,2,c) reshape breaks the 128-lane layout and the
tiny-axis cumsums lower to relayout storms). The custom path was therefore
REMOVED from models/layers.py; its implementation lives here (inline below)
so the negative result stays reproducible. See PERF.md "What was tried".

Usage: python scripts/bench_maxpool_ab.py [--bs 128] [--size 224] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial as _partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp


# ---- the removed custom scatter-free max-pool (kept here for the A/B) ----


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _nonoverlap_max_pool(x, w: int):
    n, h, wd, c = x.shape
    return jnp.max(x.reshape(n, h // w, w, wd // w, w, c), axis=(2, 4))


def _nmp_fwd(x, w: int):
    return _nonoverlap_max_pool(x, w), x


def _nmp_bwd(w: int, x, g):
    # Route the gradient to the FIRST max in window row-major order using
    # only elementwise ops and cumsums over the tiny window axes.
    n, h, wd, c = x.shape
    hp, wp = h // w, wd // w
    xr = x.reshape(n, hp, w, wp, w, c)
    y = jnp.max(xr, axis=(2, 4), keepdims=True)
    eq = xr == y
    row_any = jnp.any(eq, axis=4, keepdims=True).astype(jnp.int32)
    rows_before = jnp.cumsum(row_any, axis=2) - row_any
    within = jnp.cumsum(eq.astype(jnp.int32), axis=4) - eq
    first = eq & (rows_before == 0) & (within == 0)
    gx = jnp.where(first, g.reshape(n, hp, 1, wp, 1, c).astype(x.dtype), 0)
    return (gx.reshape(n, h, wd, c),)


_nonoverlap_max_pool.defvjp(_nmp_fwd, _nmp_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _overlap_max_pool(x, w: int, s: int, p: int):
    return nn.max_pool(x, window_shape=(w, w), strides=(s, s), padding=((p, p), (p, p)))


def _omp_fwd(x, w: int, s: int, p: int):
    return _overlap_max_pool(x, w, s, p), x


def _omp_bwd(w: int, s: int, p: int, x, g):
    # Per window, argmax over the w*w strided views picks the first max;
    # each offset's contribution is placed back by an interior-dilated
    # lax.pad and the w*w pads sum.
    n, h, wd, c = x.shape
    hp = (h + 2 * p - w) // s + 1
    wp = (wd + 2 * p - w) // s + 1
    h2, w2 = h + 2 * p, wd + 2 * p
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=neg)
    views = [
        xp[:, a : a + (hp - 1) * s + 1 : s, b : b + (wp - 1) * s + 1 : s, :]
        for a in range(w)
        for b in range(w)
    ]
    am = jnp.argmax(jnp.stack(views), axis=0)
    zero = jnp.asarray(0, x.dtype)
    acc = None
    for k in range(w * w):
        a, b = divmod(k, w)
        gk = jnp.where(am == k, g.astype(x.dtype), zero)
        part = jax.lax.pad(
            gk,
            zero,
            (
                (0, 0, 0),
                (a, h2 - a - (hp - 1) * s - 1, s - 1),
                (b, w2 - b - (wp - 1) * s - 1, s - 1),
                (0, 0, 0),
            ),
        )
        acc = part if acc is None else acc + part
    return (acc[:, p : h2 - p, p : w2 - p, :],)


_overlap_max_pool.defvjp(_omp_fwd, _omp_bwd)


def custom_max_pool(x, window: int = 3, stride: int = 2, padding: int = 1):
    if window == stride and padding == 0 and x.shape[1] % window == 0 and x.shape[2] % window == 0:
        return _nonoverlap_max_pool(x, window)
    return _overlap_max_pool(x, window, stride, padding)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models import layers as layers_mod
    from sota_imagenet_tpu.models import resnet as resnet_mod
    from sota_imagenet_tpu.models import resnet50
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.schedule import make_lr_schedule
    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    n_chips = jax.device_count()
    mesh = create_mesh()
    bs = args.bs * n_chips

    xla_max_pool = layers_mod.max_pool  # the shipped implementation

    criterion = CrossEntropyLoss(smoothing=0.1)
    sched = make_lr_schedule([dict(ep=(0, 90), lr=(1.0, 0.0), mode="cos")], steps_per_epoch=100)

    rng = jax.random.PRNGKey(0)
    sh = batch_sharding(mesh)
    images = jax.device_put(jax.random.normal(rng, (bs, args.size, args.size, 3), jnp.bfloat16), sh)
    labels = jax.device_put(jax.nn.one_hot(jnp.arange(bs) % 1000, 1000, dtype=jnp.float32), sh)
    batch = {"image": images, "label": labels}

    for name, impl in [("custom_argmax_routing", custom_max_pool), ("xla_select_and_scatter", xla_max_pool)]:
        # resnet.py binds max_pool by value at import time — patch BOTH modules
        layers_mod.max_pool = impl
        resnet_mod.max_pool = impl
        model = resnet50(dtype=jnp.bfloat16)
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
        step = jax.jit(
            steps_lib.build_train_step(model, criterion, tx, sched, input_dtype=jnp.bfloat16),
            donate_argnums=(0,),
        )
        state = steps_lib.init_state(model, tx, (bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
        state = jax.device_put(state, replicate(mesh))
        for _ in range(3):
            state, metrics = step(state, batch, rng)
        jax.device_get(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch, rng)
        jax.device_get(metrics["loss"])
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "maxpool": name,
                    "img_per_sec_per_chip": round(bs * args.iters / dt / n_chips, 1),
                    "ms_per_step": round(dt / args.iters * 1000, 2),
                }
            ),
            flush=True,
        )
    layers_mod.max_pool = xla_max_pool
    resnet_mod.max_pool = xla_max_pool


if __name__ == "__main__":
    main()
