"""Pallas per-channel moments kernel for BatchNorm statistics.

Why: profiling (ROADMAP.md) shows BN statistics reductions are 47% of the
ResNet-50 train step, and XLA's (B,H,W)-reduction over channels-last tensors
achieves only 50-225 GB/s of the ~800 GB/s HBM peak (measured; worst for
large C). This kernel streams the tensor once through VMEM and accumulates
per-channel sum and sum-of-squares in fp32 — one pass, both moments.

Differentiable via custom_vjp: d mean/dx = 1/N, d var/dx = 2(x-mean)/N — an
elementwise expression XLA fuses into the surrounding BN backward, exactly
like the lowering it uses for its own reduce-based moments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _moments_kernel(n_valid: int, tn: int):
    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        x = x_ref[...].astype(jnp.float32)  # (TN, C)
        # mask the padded tail rows of the last tile
        base = i * tn
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
        x = jnp.where(rows < n_valid, x, 0.0)
        s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
        s2 = jnp.sum(x * x, axis=0, keepdims=True)
        part = jnp.concatenate([s, s2, jnp.zeros((SUBLANES - 2, x.shape[1]), jnp.float32)], axis=0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = part

        @pl.when(i > 0)
        def _():
            out_ref[...] += part

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moments(x: jnp.ndarray, interpret: bool = False):
    """Per-channel (mean, var) over all leading axes of a (..., C) tensor."""
    return _moments_fwd(x, interpret)[0]


def _moments_impl(x: jnp.ndarray, interpret: bool):
    c = x.shape[-1]
    n = x.size // c
    flat = x.reshape(n, c)
    # row tile: big enough to amortize, padded tail masked in-kernel
    tn = min(2048, max(SUBLANES, (n + SUBLANES - 1) // SUBLANES * SUBLANES))
    tiles = pl.cdiv(n, tn)
    pad = tiles * tn - n
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _moments_kernel(n, tn),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANES, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, c), jnp.float32),
        interpret=interpret,
    )(flat)
    mean = out[0] / n
    var = jnp.maximum(out[1] / n - jnp.square(mean), 0.0)
    return mean, var


def _moments_fwd(x, interpret):
    mean, var = _moments_impl(x, interpret)
    return (mean, var), (x, mean)


def _moments_bwd(interpret, res, g):
    x, mean = res
    dmean, dvar = g
    n = x.size // x.shape[-1]
    # d mean/dx = 1/N ; d var/dx = 2 (x - mean) / N
    dx = (dmean + dvar * 2.0 * (x.astype(jnp.float32) - mean)) / n
    return (dx.astype(x.dtype),)


moments.defvjp(_moments_fwd, _moments_bwd)
