"""Fused Pallas augmentation kernel vs the XLA reference implementation.

Randomness is drawn OUTSIDE the kernel (scalar prefetch), so the kernel is
fully testable interpreted on CPU; on TPU the identical kernel compiles
natively (validated on the real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD
from sota_imagenet_tpu.ops.augment import build_train_augment
from sota_imagenet_tpu.ops.pallas_aug import N_BASE_SCALARS, draw_augment_scalars, pallas_augment

ON_TPU = jax.default_backend() == "tpu"


def _imgs(b=8, s=32, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (b, s, s, 3), np.uint8)


def _run(imgs, scalars=None, **kw):
    re_count = kw.get("re_count", 3)
    if scalars is None:
        scalars = draw_augment_scalars(
            jax.random.PRNGKey(kw.pop("seed", 0)),
            imgs.shape[0],
            color_twist_prob=kw.get("color_twist_prob", 0.0),
            gray_prob=kw.get("gray_prob", 0.0),
            re_prob=kw.get("re_prob", 0.0),
            re_count=re_count,
        )
    else:
        kw.pop("seed", None)
    return np.asarray(
        pallas_augment(jnp.asarray(imgs), jnp.asarray(scalars), out_dtype=jnp.float32, interpret=not ON_TPU, **kw)
    )


def test_normalize_exact():
    imgs = _imgs()
    out = _run(imgs)
    expect = (imgs.astype(np.float32) - DATA_MEAN) / DATA_STD
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_grayscale_applied_per_flag():
    imgs = _imgs(b=4, s=8)
    scalars = np.zeros((4, N_BASE_SCALARS + 12), np.float32)
    scalars[:, 1] = 1.0  # brightness neutral
    scalars[:, 2] = 1.0  # contrast neutral
    scalars[[0, 2], 5] = 1.0  # gray on images 0 and 2
    out = _run(imgs, scalars=scalars, gray_prob=0.5)
    denorm = out * DATA_STD + DATA_MEAN
    is_gray = np.all(np.abs(denorm[..., 0] - denorm[..., 1]) < 0.51, axis=(1, 2))
    assert list(is_gray) == [True, False, True, False]


def test_erase_exact_box():
    imgs = np.full((1, 16, 16, 3), 255, np.uint8)
    scalars = np.zeros((1, N_BASE_SCALARS + 12), np.float32)
    scalars[0, 1] = scalars[0, 2] = 1.0
    scalars[0, 6] = 1.0  # apply erase
    # box 0: anchor (0.25, 0.25), shape (0.25, 0.25) -> rows/cols 4..7
    scalars[0, N_BASE_SCALARS + 0 : N_BASE_SCALARS + 4] = [0.25, 0.25, 0.25, 0.25]
    out = _run(imgs, scalars=scalars, re_prob=1.0, re_count=3)
    denorm = out[0] * DATA_STD + DATA_MEAN
    assert np.allclose(denorm[4:8, 4:8], DATA_MEAN, atol=0.51)
    assert np.allclose(denorm[:4, :], 255, atol=1.01)
    assert np.allclose(denorm[8:, :], 255, atol=1.01)


def test_color_twist_matches_xla_reference():
    """Same per-image parameters -> the kernel must match the XLA
    implementation's math closely (both do exact HSV)."""
    from sota_imagenet_tpu.ops.augment import _color_twist

    imgs = _imgs(b=3, s=8, seed=5)
    brightness, contrast, hue_frac, sat = 1.2, 0.85, 10.0 / 360.0, 1.1
    scalars = np.zeros((3, N_BASE_SCALARS + 12), np.float32)
    scalars[:, 0] = 1.0  # apply ct
    scalars[:, 1] = brightness
    scalars[:, 2] = contrast
    scalars[:, 3] = hue_frac
    scalars[:, 4] = sat
    out = _run(imgs, scalars=scalars, color_twist_prob=1.0)
    denorm = out * DATA_STD + DATA_MEAN
    # XLA-side math with identical params
    img = imgs.astype(np.float32)
    x = np.clip(brightness * (contrast * (img - 128.0) + 128.0), 0, 255)
    from sota_imagenet_tpu.ops.augment import _hsv_to_rgb, _rgb_to_hsv

    hsv = np.asarray(_rgb_to_hsv(jnp.asarray(x / 255.0)))
    h = (hsv[..., 0] + hue_frac) % 1.0
    s = np.clip(hsv[..., 1] * sat, 0, 1)
    expect = np.asarray(_hsv_to_rgb(jnp.stack([jnp.asarray(h), jnp.asarray(s), jnp.asarray(hsv[..., 2])], axis=-1))) * 255.0
    diff = np.abs(denorm - expect)
    assert np.mean(diff) < 1.5, np.mean(diff)


def test_scalar_determinism():
    imgs = _imgs(b=4, s=16)
    a = _run(imgs, re_prob=0.5, gray_prob=0.5, seed=7)
    b = _run(imgs, re_prob=0.5, gray_prob=0.5, seed=7)
    np.testing.assert_array_equal(a, b)
    c = _run(imgs, re_prob=0.5, gray_prob=0.5, seed=8)
    assert not np.array_equal(a, c)


def test_odd_size_padding():
    imgs = _imgs(b=2, s=30)  # 30*30=900, not divisible by 128
    out = _run(imgs)
    expect = (imgs.astype(np.float32) - DATA_MEAN) / DATA_STD
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_full_pallas_augment_path():
    """build_train_augment(use_pallas=True) end-to-end (interpreted on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    imgs = _imgs(b=4, s=16)
    aug = build_train_augment(
        num_classes=10, color_twist_prob=0.5, gray_prob=0.3, re_prob=0.5, out_dtype=jnp.float32,
        use_pallas=ON_TPU,  # CPU: exercise via interpret below instead
    )
    if ON_TPU:
        out = aug(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.arange(4))
    else:
        with pltpu.force_tpu_interpret_mode():
            aug_p = build_train_augment(
                num_classes=10, color_twist_prob=0.5, gray_prob=0.3, re_prob=0.5, out_dtype=jnp.float32,
                use_pallas=True,
            )
            out = aug_p(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.arange(4))
    assert out["image"].shape == (4, 16, 16, 3)
    assert out["label"].shape == (4, 10)
    assert np.isfinite(np.asarray(out["image"])).all()
