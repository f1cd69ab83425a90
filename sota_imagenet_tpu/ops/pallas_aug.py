"""Fused Pallas augmentation kernel (TPU).

One VMEM pass per image applying color-twist, grayscale, random erase and
normalization — the reference's DALI GPU augment ops (dali_dataloader.py:
81-122). Color math is DALI-exact: DALI's fn.color_twist / fn.hsv are a
*linear transform in YIQ space* (see ops/augment.py module comment), so the
whole color stage is a per-image 3x3 matrix + offset, precomputed outside and
prefetched into SMEM — far cheaper on the VPU than true-HSV branch chains,
and bit-matching the reference. Each DALI op boundary materializes uint8;
we reproduce that with round-half-to-even + clip between stages.

Why a kernel: the XLA path materializes several HBM-sized intermediates
(twisted/gray/erased variants + masks selected per-sample); here the whole
chain runs once through VMEM. Per-image randomness is just *scalars* (flags,
matrix coefficients, erase boxes), drawn outside with ``jax.random`` (keeping
determinism uniform with the rest of the framework) and handed to the kernel
via scalar prefetch into SMEM — SMEM scalar reads broadcast into vector ops
for free (vector-lane scalar extraction and two-axis broadcasts are
unsupported in Mosaic).

Layout: the (H, W, 3) image is processed planar as (3*ROWS, 128) where
ROWS = ceil(H*W/128): rows [0,R) are the R plane, [R,2R) G, [2R,3R) B. The
caller transposes NHWC→planar (a fused XLA copy) and blurs in XLA beforehand
(a conv XLA schedules well); the caller mirrors AFTER the kernel (reference
order: erase precedes mirror, dali_dataloader.py:113-122). Images feed as
bfloat16 (exact for 0..255 — Mosaic has no uint8→f32 cast).

All distributions match the reference exactly:
  contrast/brightness ~ U[0.7,1.3] around half-range 128, hue ~ U[-20°,20°],
  saturation ~ U[0.7,1.3], erase: re_count boxes, anchor~U[0,1],
  shape~U[0.05,0.25], fill = round(127.5) = 128; normalize mean .5*255 /
  std .2*255 (dali_dataloader.py:27-29,85-122).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD
from sota_imagenet_tpu.ops.augment import dali_color_matrix

LANES = 128
# m00..m22 (row-major), offset, apply_gray, apply_re
N_BASE_SCALARS = 12


# the single source of the DALI uint8-staging convention — the kernel and the
# XLA path must round identically or the parity tests drift
from sota_imagenet_tpu.ops.augment import _u8_round  # noqa: E402


def _make_kernel(h, w, rows, color_twist_prob, gray_prob, re_prob, re_count, out_dtype):
    def kernel(scalars_ref, img_ref, out_ref):
        i = pl.program_id(0)
        x = img_ref[0].astype(jnp.float32)  # (3*rows, 128)
        r = x[0:rows, :]
        g = x[rows : 2 * rows, :]
        b = x[2 * rows : 3 * rows, :]

        # ---- color twist: one linear YIQ transform (dali_dataloader.py:85-94).
        # The per-image matrix is identity/offset-0 when the coin said no, so
        # there is no branch here.
        if color_twist_prob > 0:
            m = [scalars_ref[i, k] for k in range(9)]
            off = scalars_ref[i, 9]
            rt = m[0] * r + m[1] * g + m[2] * b + off
            gt = m[3] * r + m[4] * g + m[5] * b + off
            bt = m[6] * r + m[7] * g + m[8] * b + off
            r, g, b = _u8_round(rt), _u8_round(gt), _u8_round(bt)

        apply_gray = scalars_ref[i, 10] != 0.0
        apply_re = scalars_ref[i, 11] != 0.0

        # ---- grayscale = fn.hsv(saturation=0) = YIQ luma (dali_dataloader.py:96-98)
        if gray_prob > 0:
            luma = _u8_round(0.299 * r + 0.587 * g + 0.114 * b)
            r = jnp.where(apply_gray, luma, r)
            g = jnp.where(apply_gray, luma, g)
            b = jnp.where(apply_gray, luma, b)

        # ---- random erase (dali_dataloader.py:100-110); fill 127.5 -> u8 128
        if re_prob > 0:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
            lin = row_ids * LANES + col_ids  # linear pixel index (pad tail harmless)
            px = (lin % w).astype(jnp.float32) * (1.0 / w)
            py = (lin // w).astype(jnp.float32) * (1.0 / h)
            mask = jnp.zeros((rows, LANES), dtype=jnp.bool_)
            for k in range(re_count):
                base = N_BASE_SCALARS + 4 * k
                ay = scalars_ref[i, base + 0]
                ax = scalars_ref[i, base + 1]
                sy = scalars_ref[i, base + 2]
                sx = scalars_ref[i, base + 3]
                inbox = (py >= ay) & (py < ay + sy) & (px >= ax) & (px < ax + sx)
                mask = mask | inbox
            mask = mask & apply_re
            r = jnp.where(mask, 128.0, r)
            g = jnp.where(mask, 128.0, g)
            b = jnp.where(mask, 128.0, b)

        # ---- normalize (dali_dataloader.py:113-122)
        inv = 1.0 / DATA_STD
        out_ref[0, 0:rows, :] = ((r - DATA_MEAN) * inv).astype(out_dtype)
        out_ref[0, rows : 2 * rows, :] = ((g - DATA_MEAN) * inv).astype(out_dtype)
        out_ref[0, 2 * rows : 3 * rows, :] = ((b - DATA_MEAN) * inv).astype(out_dtype)

    return kernel


def draw_augment_scalars(
    rng: jax.Array,
    batch: int,
    *,
    color_twist_prob: float = 0.0,
    contrast_range: Tuple[float, float] = (0.7, 1.3),
    brightness_range: Tuple[float, float] = (0.7, 1.3),
    gray_prob: float = 0.0,
    re_prob: float = 0.0,
    re_count: int = 3,
) -> jnp.ndarray:
    """(B, 12 + 4*re_count) float32 per-image parameters: color matrix
    (identity when the color coin said no), offset, gray/erase flags, erase
    boxes — reference distributions (dali_dataloader.py:85-110)."""
    n = 7 + 4 * re_count
    u = jax.random.uniform(rng, (batch, n))
    apply_ct = u[:, 0] < color_twist_prob
    brightness = brightness_range[0] + u[:, 1] * (brightness_range[1] - brightness_range[0])
    contrast = contrast_range[0] + u[:, 2] * (contrast_range[1] - contrast_range[0])
    hue_deg = -20.0 + u[:, 3] * 40.0
    saturation = 0.7 + u[:, 4] * 0.6
    a, off = dali_color_matrix(hue_deg, saturation, contrast, brightness)  # (B,3,3), (B,)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape)
    a = jnp.where(apply_ct[:, None, None], a, eye)
    off = jnp.where(apply_ct, off, 0.0)
    cols = [
        a.reshape(batch, 9),
        off[:, None],
        (u[:, 5] < gray_prob).astype(jnp.float32)[:, None],
        (u[:, 6] < re_prob).astype(jnp.float32)[:, None],
    ]
    for k in range(re_count):
        base = 7 + 4 * k
        cols.append(u[:, base + 0 : base + 1])  # anchor y ~ U[0,1]
        cols.append(u[:, base + 1 : base + 2])  # anchor x
        cols.append(0.05 + u[:, base + 2 : base + 3] * 0.20)  # shape y ~ U[0.05,0.25]
        cols.append(0.05 + u[:, base + 3 : base + 4] * 0.20)  # shape x
    return jnp.concatenate(cols, axis=1).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("color_twist_prob", "gray_prob", "re_prob", "re_count", "out_dtype", "interpret"),
)
def pallas_augment(
    images_u8: jnp.ndarray,  # (B, H, W, 3) uint8, already blurred (mirror comes AFTER)
    scalars: jnp.ndarray,  # (B, 12 + 4*re_count) from draw_augment_scalars
    *,
    color_twist_prob: float = 0.0,
    gray_prob: float = 0.0,
    re_prob: float = 0.0,
    re_count: int = 3,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,  # CPU tests run the kernel interpreted
) -> jnp.ndarray:
    """Returns normalized (B, H, W, 3) images in out_dtype."""
    bsz, h, w, _ = images_u8.shape
    hw = h * w
    rows = pl.cdiv(hw, LANES)
    pad = rows * LANES - hw
    # NHWC -> planar (B, 3, hw) -> pad -> (B, 3*rows, 128).
    # bf16 carries 0..255 exactly; Mosaic has no uint8->f32 cast.
    planar = jnp.transpose(images_u8, (0, 3, 1, 2)).reshape(bsz, 3, hw).astype(jnp.bfloat16)
    if pad:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, pad)))
    planar = planar.reshape(bsz, 3 * rows, LANES)

    kernel = _make_kernel(h, w, rows, color_twist_prob, gray_prob, re_prob, re_count, out_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz,),
            in_specs=[pl.BlockSpec((1, 3 * rows, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 3 * rows, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 3 * rows, LANES), out_dtype),
        interpret=interpret,
    )(scalars.astype(jnp.float32), planar)

    out = out.reshape(bsz, 3, rows * LANES)[:, :, :hw].reshape(bsz, 3, h, w)
    return jnp.transpose(out, (0, 2, 3, 1))
