#!/usr/bin/env python
"""Microbench: fused pallas conv1x1+stats vs XLA conv1x1 followed by separate
BN-stats reductions, on the real chip, for the ResNet-50 bottleneck shapes
(bs 128 @ 224). Timings use in-jit fori_loops (the axon tunnel has a ~700us
per-dispatch floor that poisons per-call timing).

    python scripts/bench_conv_stats.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sota_imagenet_tpu.ops.pallas_conv_stats import conv1x1_stats

# (M = B*H*W, K, N): r50 bottleneck 1x1s at bs128/224
SHAPES = [
    (128 * 56 * 56, 64, 256),    # stage1 expand
    (128 * 56 * 56, 256, 64),    # stage1 reduce
    (128 * 28 * 28, 512, 128),   # stage2 reduce
    (128 * 28 * 28, 128, 512),   # stage2 expand
    (128 * 14 * 14, 1024, 256),  # stage3 reduce
    (128 * 14 * 14, 256, 1024),  # stage3 expand
    (128 * 7 * 7, 512, 2048),    # stage4 expand
]
ITERS = 30


def timed(fn, *args):
    fn(*args)  # compile
    jax.device_get(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / ITERS


def xla_fwd(x, w):
    def body(i, carry):
        x, acc = carry
        y = jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y32 = y.astype(jnp.float32)
        s1 = jnp.sum(y32, axis=0)
        s2 = jnp.sum(y32 * y32, axis=0)
        return x + y[:, :1] * 0, acc + s1[0] + s2[0]

    return jax.lax.fori_loop(0, ITERS, body, (x, 0.0))[1]


def fused_fwd(x, w):
    def body(i, carry):
        x, acc = carry
        y, s1, s2 = conv1x1_stats(x, w)
        return x + y[:, :1].astype(x.dtype) * 0, acc + s1[0] + s2[0]

    return jax.lax.fori_loop(0, ITERS, body, (x, 0.0))[1]


def grad_loss(stats_fn):
    def loss(x, w):
        y, s1, s2 = stats_fn(x, w)
        m = y.shape[0]
        mean = s1 / m
        var = s2 / m - mean**2
        return jnp.sum(y.astype(jnp.float32) * 1e-6) + jnp.sum(mean) * 1e-3 + jnp.sum(var) * 1e-3

    g = jax.grad(loss, argnums=(0, 1))

    def run(x, w):
        def body(i, carry):
            x, acc = carry
            gx, gw = g(x, w)
            return x, acc + gx[0, 0] + gw[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, (x, 0.0))[1]

    return run


def xla_stats(x, w):
    y = jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y32 = y.astype(jnp.float32)
    return y, jnp.sum(y32, axis=0), jnp.sum(y32 * y32, axis=0)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    tot_x, tot_f = 0.0, 0.0
    for m, k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, m * k + n))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.float32) * 0.05
        t_xla = timed(jax.jit(xla_fwd), x, w)
        t_fused = timed(jax.jit(fused_fwd), x, w)
        t_xla_g = timed(jax.jit(grad_loss(xla_stats)), x, w)
        t_fused_g = timed(jax.jit(grad_loss(lambda a, b: conv1x1_stats(a, b))), x, w)
        tot_x += t_xla
        tot_f += t_fused
        print(
            f"M={m:9d} K={k:4d} N={n:4d}  fwd xla {t_xla*1e3:7.3f}ms fused {t_fused*1e3:7.3f}ms "
            f"({t_xla/t_fused:4.2f}x) | fwd+bwd xla {t_xla_g*1e3:7.3f}ms fused {t_fused_g*1e3:7.3f}ms "
            f"({t_xla_g/t_fused_g:4.2f}x)",
            flush=True,
        )
    print(f"TOTAL fwd: xla {tot_x*1e3:.3f}ms fused {tot_f*1e3:.3f}ms ({tot_x/tot_f:.2f}x)")


if __name__ == "__main__":
    main()
