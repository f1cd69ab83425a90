"""On-device augmentation (the DALI GPU-augment replacement).

The host ships raw uint8 NHWC crops (cheap PCIe transfer); everything
pixel-math runs on the TPU inside one jitted function that XLA fuses into a
few VPU kernels: coin-flip mirror, color twist, grayscale, gaussian blur,
random erase, normalize, one-hot — mirroring the reference train pipeline
ops (dali_dataloader.py:81-123) with the same parameter distributions.

Per-sample randomness comes from vmapped `jax.random` keys — functional and
reproducible across restarts (the DALI pipeline's RNG was stateful).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD


# --------------------------------------------------------------------------- #
# DALI color math — linearized YIQ (NOT true HSV)
#
# DALI's ``fn.hsv`` and ``fn.color_twist`` (used by the reference at
# dali_dataloader.py:85-98) do not convert to real HSV: per the DALI docs the
# operation "is approximated by a linear transformation within the YIQ color
# space" — project onto the neutral (gray) axis, rotate chroma by the hue
# angle, scale chroma by the saturation factor, convert back. Brightness and
# contrast compose into the same single linear transform (contrast centered at
# half-range 128), with ONE saturating round-to-uint8 at the end of each DALI
# op (no intermediate clipping). Consequences we reproduce exactly:
#   * grayscale (fn.hsv(saturation=0)) is the Rec.601/YIQ luma broadcast,
#     because YIQ2RGB @ diag(1,0,0) @ RGB2YIQ == outer((1,1,1), (.299,.587,.114))
#     — NOT the max-channel V of true HSV;
#   * hue rotation can leave the RGB cube; values only saturate at the final
#     uint8 cast;
#   * each DALI op materializes uint8 between stages (round half-to-even).
# --------------------------------------------------------------------------- #

RGB2YIQ = ((0.299, 0.587, 0.114), (0.596, -0.274, -0.321), (0.211, -0.523, 0.311))
YIQ2RGB = ((1.0, 0.956, 0.621), (1.0, -0.272, -0.647), (1.0, -1.107, 1.705))


def dali_color_matrix(hue_deg, saturation, contrast, brightness):
    """Per-image 3x3 matrix + offset reproducing DALI fn.color_twist.

    out = A @ rgb + off  with  A = brightness*contrast * YIQ2RGB @ R(h)·S(s) @ RGB2YIQ
    and off = brightness*128*(1-contrast). Accepts scalars or batched (B,)
    arrays; returns (..., 3, 3) and (...,). The hue rotation and saturation
    scaling act on the (I, Q) chroma plane and commute; the color matrix fixes
    the gray axis (A·(128,128,128) pre-scale = same), so the brightness/
    contrast composition order matches DALI's fused transform exactly.
    """
    h = hue_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(h), jnp.sin(h)
    one, zero = jnp.ones_like(h), jnp.zeros_like(h)
    sat = saturation
    chroma = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, sat * c, sat * s], -1),
            jnp.stack([zero, -sat * s, sat * c], -1),
        ],
        -2,
    )
    m = jnp.asarray(YIQ2RGB) @ chroma @ jnp.asarray(RGB2YIQ)
    a = (brightness * contrast)[..., None, None] * m if m.ndim == 3 else brightness * contrast * m
    off = brightness * 128.0 * (1.0 - contrast)
    return a, off


def _u8_round(x):
    """DALI materializes uint8 between pipeline ops: saturating cast with
    round-half-to-even (matches CUDA __float2int_rn). We keep float carrying
    exact integer values."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def _color_twist(key, img, contrast_range, brightness_range):
    """DALI color_twist (dali_dataloader.py:85-94): one linear YIQ transform,
    single saturating uint8 cast at the end."""
    kb, kc, kh, ks = jax.random.split(key, 4)
    brightness = jax.random.uniform(kb, (), minval=brightness_range[0], maxval=brightness_range[1])
    contrast = jax.random.uniform(kc, (), minval=contrast_range[0], maxval=contrast_range[1])
    hue_deg = jax.random.uniform(kh, (), minval=-20.0, maxval=20.0)
    saturation = jax.random.uniform(ks, (), minval=0.7, maxval=1.3)
    a, off = dali_color_matrix(hue_deg, saturation, contrast, brightness)
    return _u8_round(jnp.einsum("hwc,dc->hwd", img, a) + off)


def _grayscale(img):
    """DALI fn.hsv(saturation=0) == YIQ luma broadcast (see module comment);
    rounded to uint8 like the DALI op's output."""
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return _u8_round(jnp.stack([luma, luma, luma], axis=-1))


def _gaussian_blur(img, sigma, window: int = 11):
    """Separable gaussian blur, window 11 (dali_dataloader.py:82)."""
    r = window // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (xs / jnp.maximum(sigma, 1e-3)) ** 2)
    kern = kern / jnp.sum(kern)
    # img: (H, W, 3); blur H then W via conv1d per axis
    def conv_axis(x, axis):
        x = jnp.moveaxis(x, axis, -1)  # (..., L)
        shape = x.shape
        flat = x.reshape(-1, 1, shape[-1])  # NCW
        out = jax.lax.conv_general_dilated(
            flat, kern.reshape(1, 1, window), (1,), ((r, r),), dimension_numbers=("NCW", "OIW", "NCW")
        )
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


def _batch_gaussian_blur(images, sigmas, window: int = 11):
    """Per-sample-sigma separable blur for the whole batch in TWO depthwise
    convs: samples are packed into the channel dim and each channel gets its
    own kernel (feature_group_count = B*3). Avoids vmapping a conv per sample,
    which multiplies compile time by B."""
    b, h, w, c = images.shape
    r = window // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (xs[None, :] / jnp.maximum(sigmas[:, None], 1e-3)) ** 2)  # (B, win)
    kern = kern / jnp.sum(kern, axis=1, keepdims=True)
    kern_bc = jnp.repeat(kern, c, axis=0)  # (B*C, win), per packed channel
    # pack: (B,H,W,C) -> (1, H, W, B*C)
    x = jnp.transpose(images, (1, 2, 0, 3)).reshape(1, h, w, b * c)

    def dw(x, kernel_hw):  # kernel (kh, kw, 1, B*C)
        return jax.lax.conv_general_dilated(
            x,
            kernel_hw,
            (1, 1),
            ((kernel_hw.shape[0] // 2, kernel_hw.shape[0] // 2), (kernel_hw.shape[1] // 2, kernel_hw.shape[1] // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c,
        )

    x = dw(x, kern_bc.T.reshape(window, 1, 1, b * c))  # vertical
    x = dw(x, kern_bc.T.reshape(1, window, 1, b * c))  # horizontal
    return jnp.transpose(x.reshape(h, w, b, c), (2, 0, 1, 3))


def _random_erase(key, img, re_count: int, fill: float):
    """DALI fn.erase with normalized anchor/shape (dali_dataloader.py:100-110):
    re_count boxes, anchor ~ U[0,1], shape ~ U[0.05,0.25].

    KNOWN unverified convention (no DALI in this environment to diff against):
    box membership here is a continuous pixel-center comparison
    (y/h >= anchor), while DALI floors the anchor to an integer pixel index —
    box edges can differ by ±1 row/col. Statistically immaterial (box sides
    are 11-56 px at 224²); recorded in ROADMAP.md."""
    h, w = img.shape[0], img.shape[1]
    ka, ks = jax.random.split(key)
    anchors = jax.random.uniform(ka, (re_count, 2))
    shapes = jax.random.uniform(ks, (re_count, 2), minval=0.05, maxval=0.25)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] / h
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] / w
    mask = jnp.zeros((h, w), dtype=bool)
    for i in range(re_count):
        ay, ax = anchors[i, 0], anchors[i, 1]
        sy, sx = shapes[i, 0], shapes[i, 1]
        box = (yy >= ay) & (yy < ay + sy) & (xx >= ax) & (xx < ax + sx)
        mask = mask | box
    return jnp.where(mask[..., None], fill, img)


def build_train_augment(
    *,
    num_classes: int = 1000,
    blur_prob: float = 0.0,
    gray_prob: float = 0.0,
    color_twist_prob: float = 0.0,
    contrast_range: Tuple[float, float] = (0.7, 1.3),
    brightness_range: Tuple[float, float] = (0.7, 1.3),
    re_prob: float = 0.0,
    re_count: int = 3,
    out_dtype=jnp.bfloat16,
    use_pallas: bool = None,
    resample_to: int = None,
) -> Callable:
    """Returns jitted fn(rng, images_u8, labels[, meta]) -> {'image', 'label'}.

    On TPU the color/erase/normalize chain runs as ONE fused Pallas kernel
    (ops/pallas_aug.py) with per-image random scalars prefetched into SMEM;
    mirror (a layout op) and blur (a conv) stay in XLA. The pure-XLA path
    below is the reference implementation and the CPU/test path.

    ``resample_to``: device-resample mode (loader.device_resample) — images
    arrive as DCT-scaled crops on a fixed canvas with per-sample (sh, sw,
    filt) meta, and the triangular/cubic resample to ``resample_to`` runs on
    the MXU first (ops/resample.py), replacing the host resample.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        from sota_imagenet_tpu.ops.pallas_aug import draw_augment_scalars, pallas_augment

        @jax.jit
        def pallas_path(rng, images_u8, labels):
            k_blur, k_sig, k_mir, k_sc = jax.random.split(rng, 4)
            bsz = images_u8.shape[0]
            if blur_prob > 0:
                imgf = images_u8.astype(jnp.float32)
                sigmas = jax.random.uniform(k_sig, (bsz,), minval=0.5, maxval=1.1)
                blurred = _batch_gaussian_blur(imgf, sigmas)
                pick = jax.random.bernoulli(k_blur, blur_prob, (bsz, 1, 1, 1))
                images_u8 = _u8_round(jnp.where(pick, blurred, imgf)).astype(jnp.uint8)
            scalars = draw_augment_scalars(
                k_sc,
                images_u8.shape[0],
                color_twist_prob=color_twist_prob,
                contrast_range=tuple(contrast_range),
                brightness_range=tuple(brightness_range),
                gray_prob=gray_prob,
                re_prob=re_prob,
                re_count=re_count,
            )
            images = pallas_augment(
                images_u8,
                scalars,
                color_twist_prob=color_twist_prob,
                gray_prob=gray_prob,
                re_prob=re_prob,
                re_count=re_count,
                out_dtype=out_dtype,
            )
            # mirror LAST, like the reference (crop_mirror_normalize comes after
            # erase, dali_dataloader.py:113-122) — the order matters for erase:
            # its boxes only clip at the right/bottom edge pre-mirror, so
            # mirroring after erase symmetrizes the box distribution. Mirror
            # commutes with the (pointwise) normalize inside the kernel.
            mir = jax.random.bernoulli(k_mir, 0.5, (bsz, 1, 1, 1))
            images = jnp.where(mir, images[:, :, ::-1, :], images)
            onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)
            return {"image": images, "label": onehot}

        return _with_resample(pallas_path, resample_to)

    def per_sample(key, img_u8):
        img = img_u8.astype(jnp.float32)
        keys = jax.random.split(key, 6)
        if color_twist_prob > 0:
            twisted = _color_twist(keys[2], img, contrast_range, brightness_range)
            img = jnp.where(jax.random.bernoulli(jax.random.fold_in(keys[2], 1), color_twist_prob), twisted, img)
        if gray_prob > 0:
            img = jnp.where(jax.random.bernoulli(keys[3], gray_prob), _grayscale(img), img)
        if re_prob > 0:
            # DALI fn.erase writes fill_value=127.5 into a uint8 buffer, which
            # rounds to 128 (dali_dataloader.py:100-110)
            erased = _random_erase(keys[4], img, re_count, 128.0)
            img = jnp.where(jax.random.bernoulli(jax.random.fold_in(keys[4], 1), re_prob), erased, img)
        # mirror (crop_mirror_normalize, dali_dataloader.py:113-122)
        mirrored = img[:, ::-1, :]
        img = jnp.where(jax.random.bernoulli(keys[5], 0.5), mirrored, img)
        return (img - DATA_MEAN) / DATA_STD

    @jax.jit
    def augment(rng, images_u8, labels):
        bsz = images_u8.shape[0]
        k_blur, k_sig, k_rest = jax.random.split(rng, 3)
        if blur_prob > 0:
            # batch-level blur (per-sample sigma packed into channels) —
            # vmapping a conv per sample multiplies compile time by B
            imgf = images_u8.astype(jnp.float32)
            sigmas = jax.random.uniform(k_sig, (bsz,), minval=0.5, maxval=1.1)
            blurred = _batch_gaussian_blur(imgf, sigmas)
            pick = jax.random.bernoulli(k_blur, blur_prob, (bsz, 1, 1, 1))
            images_u8 = _u8_round(jnp.where(pick, blurred, imgf)).astype(jnp.uint8)
        keys = jax.random.split(k_rest, bsz)
        images = jax.vmap(per_sample)(keys, images_u8).astype(out_dtype)
        onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)
        return {"image": images, "label": onehot}

    return _with_resample(augment, resample_to)


def _with_resample(inner, resample_to):
    """Compose the device resample as its OWN jit dispatch ahead of the
    augment jit. Folding the resample einsums into the same jitted graph as
    the pallas augment made XLA fuse them toward the pallas operand chain and
    lower them off the MXU: measured 6,337 ms/batch fused vs 8.8 (resample) +
    13.5 (augment) ms as separate programs on the real chip. Two dispatches
    cost ~nothing; keep them separate."""
    if resample_to is None:
        return inner
    import functools

    from sota_imagenet_tpu.ops.resample import device_resample

    @functools.partial(jax.jit, static_argnames=("out_size",))
    def _resample_u8(images, meta, out_size):
        return device_resample(images, meta, out_size=out_size).astype(jnp.uint8)

    def with_resample(rng, images_u8, labels, meta):
        return inner(rng, _resample_u8(images_u8, meta, resample_to), labels)

    return with_resample


def build_val_augment(*, num_classes: int = 1000, out_dtype=jnp.bfloat16) -> Callable:
    @jax.jit
    def augment(rng, images_u8, labels):
        del rng  # uniform signature with the train augment
        images = ((images_u8.astype(jnp.float32) - DATA_MEAN) / DATA_STD).astype(out_dtype)
        onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)
        return {"image": images, "label": onehot}

    return augment
