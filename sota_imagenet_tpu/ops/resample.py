"""Device-side image resampling as batched dense matmuls (MXU-native).

The TPU half of the device-resample split (reference analog: DALI's GPU
resize after fused decode+crop, dali_dataloader.py:73-80). The host ships the
DCT-scaled crop on a fixed (canvas, canvas) uint8 buffer plus its valid
(h, w) extent; here each image is resampled to (out_size, out_size) by two
einsums with PER-SAMPLE weight matrices built on device from the extents:

    tmp[b,o,w,c] = sum_i Wv[b,o,i] * img[b,i,w,c]        (vertical pass)
    out[b,o,p,c] = sum_j Wh[b,p,j] * tmp[b,o,j,c]        (horizontal pass)

Why matmuls and not a gather kernel: separable resampling IS a (sparse-banded)
linear map per axis; materializing it dense costs ~0.26 GFLOP/image at
448->224 — noise for the MXU — while gathers with dynamic indices are exactly
what Mosaic/XLA schedule worst. Dense weights also make the per-sample
dynamic scale a pure data dependency: one compiled graph for every
(crop-dependent) input size.

The weight math is bit-faithful to the host resampler (native/imgpipe.cpp
build_taps — itself matched to PIL/DALI): triangle or Catmull-Rom (a=-0.5)
kernel, antialias widening by fscale=max(in/out, 1) on downscale, pixel-center
mapping center(o) = (o+0.5)*in/out - 0.5, edge handling by clamping the tap
window to the valid extent and renormalizing (here: exact-zero weights beyond
the extent + renormalize — identical because both kernels have compact
support). Final cast rounds half-up like the C path's +0.5f/clamp. When
in == out the triangle weights collapse to the identity, so host-side
fallback resizes (rare giant sources) pass through unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FILT_TRIANGULAR = 0
FILT_CUBIC = 1


def _triangle(x):
    ax = jnp.abs(x)
    return jnp.maximum(1.0 - ax, 0.0)


def _catmull_rom(x):
    # Keys cubic, a = -0.5 (PIL BICUBIC / DALI INTERP_CUBIC; imgpipe.cpp:54-60)
    a = -0.5
    ax = jnp.abs(x)
    near = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    far = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return jnp.where(ax < 1.0, near, jnp.where(ax < 2.0, far, 0.0))


def resample_weights(sizes, out_size: int, canvas: int, is_cubic):
    """Per-sample resampling matrices (B, out_size, canvas) float32.

    sizes: (B,) int32 valid input extents (<= canvas); is_cubic: (B,) bool.
    Rows sum to 1 over the valid extent; columns >= size get exact 0.
    """
    sizes_f = sizes.astype(jnp.float32)  # (B,)
    scale = sizes_f / float(out_size)  # (B,)
    fscale = jnp.maximum(scale, 1.0)  # antialias widening on downscale
    o = jnp.arange(out_size, dtype=jnp.float32)  # (O,)
    i = jnp.arange(canvas, dtype=jnp.float32)  # (I,)
    center = (o[None, :] + 0.5) * scale[:, None] - 0.5  # (B, O)
    x = (i[None, None, :] - center[:, :, None]) / fscale[:, None, None]  # (B, O, I)
    w = jnp.where(is_cubic[:, None, None], _catmull_rom(x), _triangle(x))
    w = w * (i[None, None, :] < sizes_f[:, None, None])  # mask beyond extent
    return w / jnp.sum(w, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("out_size",))
def device_resample(images, meta, *, out_size: int):
    """(B, canvas, canvas, 3) uint8 + meta (B, 3) int32 [sh, sw, filt]
    -> (B, out_size, out_size, 3) float32 carrying exact uint8 values."""
    canvas = images.shape[1]
    is_cubic = meta[:, 2] == FILT_CUBIC
    wv = resample_weights(meta[:, 0], out_size, canvas, is_cubic)  # (B, O, I)
    wh = resample_weights(meta[:, 1], out_size, canvas, is_cubic)
    imgf = images.astype(jnp.float32)
    tmp = jnp.einsum("boi,biwc->bowc", wv, imgf)  # vertical
    out = jnp.einsum("bpj,bojc->bopc", wh, tmp)  # horizontal
    # round half-up + clamp, as the host resampler's +0.5f cast (imgpipe.cpp)
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
