"""Fused Pallas augmentation kernel (TPU).

One VMEM pass per image applying color-twist (brightness/contrast/hue/
saturation, exact HSV math), grayscale, random erase and normalization —
the reference's DALI GPU augment ops (dali_dataloader.py:81-122).

Why a kernel: the XLA path materializes several HBM-sized intermediates
(twisted/gray/erased variants + masks selected per-sample); here the whole
chain runs once through VMEM. Per-image randomness is just *scalars* (flags,
color params, erase boxes), so they are drawn outside with ``jax.random``
(keeping determinism uniform with the rest of the framework) and handed to
the kernel via scalar prefetch into SMEM — SMEM scalar reads broadcast into
vector ops for free (vector-lane scalar extraction and two-axis broadcasts
are unsupported in Mosaic).

Layout: the (H, W, 3) image is processed planar as (3*ROWS, 128) where
ROWS = ceil(H*W/128): rows [0,R) are the R plane, [R,2R) G, [2R,3R) B. The
caller transposes NHWC→planar (a fused XLA copy) and flips/blurs in XLA
beforehand (flip is a layout op; blur is a conv XLA schedules well). Images
feed as bfloat16 (exact for 0..255 — Mosaic has no uint8→f32 cast).

All distributions match the reference exactly:
  contrast/brightness ~ U[0.7,1.3] around gray 128, hue ~ U[-20°,20°],
  saturation ~ U[0.7,1.3], erase: re_count boxes, anchor~U[0,1],
  shape~U[0.05,0.25], fill = DATA_MEAN; normalize mean .5*255 / std .2*255
  (dali_dataloader.py:27-29,85-122).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD

LANES = 128
N_BASE_SCALARS = 7  # apply_ct, brightness, contrast, hue, saturation, apply_gray, apply_re


def _rgb_to_hsv(r, g, b):
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.maximum(delta, 1e-8)
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    im = i.astype(jnp.int32) % 6

    def pick(c0, c1, c2, c3, c4, c5):
        # nested where instead of jnp.select (which lowers via argmax —
        # unsupported for non-f32 in Mosaic)
        out = c5
        for idx, c in ((4, c4), (3, c3), (2, c2), (1, c1), (0, c0)):
            out = jnp.where(im == idx, c, out)
        return out

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return r, g, b


def _make_kernel(h, w, rows, color_twist_prob, gray_prob, re_prob, re_count, out_dtype):
    def kernel(scalars_ref, img_ref, out_ref):
        i = pl.program_id(0)
        x = img_ref[0].astype(jnp.float32)  # (3*rows, 128)
        r = x[0:rows, :]
        g = x[rows : 2 * rows, :]
        b = x[2 * rows : 3 * rows, :]

        # per-image scalars from SMEM (broadcast into vectors for free)
        apply_ct = scalars_ref[i, 0] != 0.0
        brightness = scalars_ref[i, 1]
        contrast = scalars_ref[i, 2]
        hue = scalars_ref[i, 3]
        saturation = scalars_ref[i, 4]
        apply_gray = scalars_ref[i, 5] != 0.0
        apply_re = scalars_ref[i, 6] != 0.0

        # ---- color twist (reference dali_dataloader.py:85-94) ----
        if color_twist_prob > 0:
            rc = jnp.clip(brightness * (contrast * (r - 128.0) + 128.0), 0.0, 255.0)
            gc = jnp.clip(brightness * (contrast * (g - 128.0) + 128.0), 0.0, 255.0)
            bc = jnp.clip(brightness * (contrast * (b - 128.0) + 128.0), 0.0, 255.0)
            hh, ss, vv = _rgb_to_hsv(rc / 255.0, gc / 255.0, bc / 255.0)
            hh = (hh + hue) % 1.0
            ss = jnp.clip(ss * saturation, 0.0, 1.0)
            rt, gt, bt = _hsv_to_rgb(hh, ss, vv)
            r = jnp.where(apply_ct, rt * 255.0, r)
            g = jnp.where(apply_ct, gt * 255.0, g)
            b = jnp.where(apply_ct, bt * 255.0, b)

        # ---- grayscale (dali_dataloader.py:96-98) ----
        if gray_prob > 0:
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            r = jnp.where(apply_gray, luma, r)
            g = jnp.where(apply_gray, luma, g)
            b = jnp.where(apply_gray, luma, b)

        # ---- random erase (dali_dataloader.py:100-110) ----
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
            r = jnp.where(mask, DATA_MEAN, r)
            g = jnp.where(mask, DATA_MEAN, g)
            b = jnp.where(mask, DATA_MEAN, b)

        # ---- normalize (dali_dataloader.py:113-122) ----
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
    """(B, 7 + 4*re_count) float32 per-image parameters, reference
    distributions (dali_dataloader.py:85-110)."""
    n = N_BASE_SCALARS + 4 * re_count
    u = jax.random.uniform(rng, (batch, n))
    cols = [
        (u[:, 0] < color_twist_prob).astype(jnp.float32),
        brightness_range[0] + u[:, 1] * (brightness_range[1] - brightness_range[0]),
        contrast_range[0] + u[:, 2] * (contrast_range[1] - contrast_range[0]),
        (-20.0 + u[:, 3] * 40.0) / 360.0,  # hue, fraction of the circle
        0.7 + u[:, 4] * 0.6,  # saturation
        (u[:, 5] < gray_prob).astype(jnp.float32),
        (u[:, 6] < re_prob).astype(jnp.float32),
    ]
    for k in range(re_count):
        base = N_BASE_SCALARS + 4 * k
        cols += [
            u[:, base + 0],  # anchor y ~ U[0,1]
            u[:, base + 1],  # anchor x
            0.05 + u[:, base + 2] * 0.20,  # shape y ~ U[0.05,0.25]
            0.05 + u[:, base + 3] * 0.20,  # shape x
        ]
    return jnp.stack(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("color_twist_prob", "gray_prob", "re_prob", "re_count", "out_dtype", "interpret"),
)
def pallas_augment(
    images_u8: jnp.ndarray,  # (B, H, W, 3) uint8, already mirrored/blurred
    scalars: jnp.ndarray,  # (B, 7 + 4*re_count) from draw_augment_scalars
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
