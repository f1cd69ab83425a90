"""Fused 1x1-conv (matmul) + BatchNorm statistics epilogue (TPU Pallas).

Round-1 profiling showed the ResNet-50 train step is HBM-bound with ~47% of
step time in BatchNorm statistics reductions (convert+reduce fusions): after
every conv, XLA re-READS the conv output from HBM to compute mean/E[x²]. For
1x1 convs (which in NHWC are matmuls and produce the largest tensors in a
bottleneck block — the 4x expand), the stats can be computed in the matmul
epilogue while the tile is still in VMEM/registers, eliminating that read.

``conv1x1_stats(x2d, w)`` returns (y, col_sum, col_sumsq) where y = x2d @ w in
bf16 and the sums are f32 over the bf16-ROUNDED y — bit-matching what XLA's
BN sees (bf16 activation converted to f32 for the reduce). Differentiable via
custom VJP: the cotangents of the sums fold into the matmul backward as
``gy_total = gy + gs1 + 2*y*gs2`` (sum d/dy = 1, sumsq d/dy = 2y), then
dx/dw are plain MXU matmuls XLA fuses the elementwise into.

Replaces: the reference's cuDNN conv + BN stats kernels (SURVEY.md §2.3);
no reference-code counterpart — this is TPU-specific perf work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bm(m: int) -> int:
    # tuned on v5e: larger m-tiles amortize the per-tile epilogue; 2048 beat
    # 1024/512/256 at the r50 shapes (scripts/bench_conv_stats.py)
    for bm in (2048, 1024, 512, 256, 128):
        if m % bm == 0:
            return bm
    return 0  # caller pads


def _kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    yb = acc.astype(jnp.bfloat16)
    y_ref[:] = yb
    y32 = yb.astype(jnp.float32)  # stats over the bf16-rounded values
    # stats blocks are (8, bn) — Mosaic requires sublane multiples of 8; the
    # sums are replicated into all 8 rows (scatter to row 0 doesn't lower) and
    # the caller divides the outer reduction by 8
    rows = s1_ref.shape[0]
    s1_ref[:] = jnp.broadcast_to(jnp.sum(y32, axis=0)[None, :], (rows, y32.shape[1]))
    s2_ref[:] = jnp.broadcast_to(jnp.sum(y32 * y32, axis=0)[None, :], (rows, y32.shape[1]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv1x1_stats_fwd_impl(x2d: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    m, k = x2d.shape
    k2, n = w.shape
    assert k == k2, (x2d.shape, w.shape)
    bm = _pick_bm(m)
    pad_m = 0
    if bm == 0:
        bm = 128
        pad_m = (-m) % bm
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    # output blocks need a lane-aligned (multiple of 128) last dim on real TPU
    # (interpret mode doesn't check): pad n up to 128 alignment, then pick the
    # largest aligned tile <= 512 that divides it (handles base_width=96
    # widths like 96/192/768)
    pad_n = (-n) % 128
    n_p = n + pad_n
    if pad_n:
        w = jnp.pad(w, ((0, 0), (0, pad_n)))
    bn = next((c for c in (512, 384, 256, 128) if n_p <= c or n_p % c == 0), None)
    bn = min(bn, n_p)
    assert n_p % bn == 0, (n_p, bn)
    nm, nn = (m + pad_m) // bm, n_p // bn

    y, s1p, s2p = pl.pallas_call(
        _kernel,
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((8, bn), lambda i, j: (i, j)),
            pl.BlockSpec((8, bn), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m + pad_m, n_p), jnp.bfloat16),
            jax.ShapeDtypeStruct((nm * 8, n_p), jnp.float32),
            jax.ShapeDtypeStruct((nm * 8, n_p), jnp.float32),
        ],
        interpret=interpret,
    )(x2d.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    if pad_m:
        y = y[:m]
    if pad_n:
        y, s1p, s2p = y[:, :n], s1p[:, :n], s2p[:, :n]
    # padded rows/cols are zero: they contribute 0 to s1/s2, no correction
    # needed. each tile's sums are replicated 8x (see _kernel), hence the /8
    return y, jnp.sum(s1p, axis=0) / 8.0, jnp.sum(s2p, axis=0) / 8.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1_stats(x2d: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """y = x2d @ w (bf16) plus f32 column sum / sum-of-squares of y.

    x2d: (M, K) activations (any float dtype; used as bf16),
    w:   (K, N) weights (fp32 master; used as bf16).
    Returns (y (M,N) bf16, sum (N,) f32, sumsq (N,) f32).
    """
    return _conv1x1_stats_fwd_impl(x2d, w, interpret)


def _fwd(x2d, w, interpret):
    out = _conv1x1_stats_fwd_impl(x2d, w, interpret)
    y = out[0]
    return out, (x2d, w, y)


def _bwd(interpret, res, cts):
    x2d, w, y = res
    gy, gs1, gs2 = cts
    # fold the stats cotangents into the activation cotangent; f32 math, then
    # bf16 for the MXU matmuls (XLA fuses the elementwise into the dot input)
    gy_tot = gy.astype(jnp.float32) + gs1[None, :] + 2.0 * y.astype(jnp.float32) * gs2[None, :]
    gy_b = gy_tot.astype(jnp.bfloat16)
    dx = jnp.dot(gy_b, w.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32).astype(x2d.dtype)
    dw = jnp.dot(x2d.astype(jnp.bfloat16).T, gy_b, preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


conv1x1_stats.defvjp(_fwd, _bwd)


def conv1x1_stats_nhwc(
    x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NHWC wrapper: 1x1 conv (optionally strided — a 1x1 stride-s conv is a
    spatial subsample followed by the matmul) + stats. w: (1,1,K,N) or (K,N).
    Returns (y (B,H',W',N), sum (N,), sumsq (N,))."""
    if w.ndim == 4:
        w = w.reshape(w.shape[-2], w.shape[-1])
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    b, h, ww, c = x.shape
    y2d, s1, s2 = conv1x1_stats(x.reshape(b * h * ww, c), w, interpret)
    return y2d.reshape(b, h, ww, -1), s1, s2
