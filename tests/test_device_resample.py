"""Device-side resample split (loader.device_resample).

Host decodes DCT-scaled crops onto a fixed canvas (native
ip_decode_crop_scaled); the triangular/cubic resample runs on the device as
per-sample-weighted matmuls (ops/resample.py). These tests pin: the weight
math (identity, normalization, extent masking), pixel parity with the host
resampler over shapes/filters/up-and-downscale, and end-to-end feed
equivalence with the host-resample path under identical rng.

Reference analog: DALI decodes+crops then resizes ON THE GPU
(dali_dataloader.py:65-80); this is the TPU-native equivalent.
"""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import decode as D
from sota_imagenet_tpu.ops.resample import FILT_CUBIC, FILT_TRIANGULAR, device_resample, resample_weights

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _jpeg(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def test_weights_identity_when_size_equals_out():
    w = resample_weights(jnp.asarray([32], jnp.int32), 32, 64, jnp.asarray([False]))
    np.testing.assert_allclose(np.asarray(w[0, :, :32]), np.eye(32), atol=1e-6)
    assert np.abs(np.asarray(w[0, :, 32:])).max() == 0.0


def test_weights_rows_normalized_and_masked():
    sizes = jnp.asarray([48, 17, 64], jnp.int32)
    for cubic in (False, True):
        w = np.asarray(resample_weights(sizes, 32, 64, jnp.asarray([cubic] * 3)))
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        for b, s in enumerate([48, 17]):
            assert np.abs(w[b, :, s:]).max() == 0.0, "weights beyond the valid extent must be exact zero"


@pytest.mark.parametrize("filt", [FILT_TRIANGULAR, FILT_CUBIC])
@pytest.mark.parametrize("size_hw", [(300, 260), (150, 97), (64, 120)])
def test_matches_host_resampler(filt, size_hw):
    """Device resample of the scaled crop must match the C resampler (which
    itself matches PIL/DALI) within the f32-vs-float rounding quantum."""
    from sota_imagenet_tpu.data import native

    rng = np.random.default_rng(1)
    sh, sw = size_hw
    crop = rng.integers(0, 256, (sh, sw, 3), np.uint8)
    out_size, canvas = 56, 112
    if native.available():
        host = native.decode_crop_resize(_jpeg(crop), (0, 0, 0, 0), (out_size, out_size), filt)
        # feed the device the SAME decoded pixels the C resampler consumed:
        # re-decode the jpeg at scale 8/8 (crop == full image, no DCT shrink
        # possible below the canvas here for the small shapes; for (300,260)
        # the C path picks a scale, so mirror it via decode_crop_scaled)
        got = native.decode_crop_scaled(_jpeg(crop), (0, 0, 0, 0), out_size, max(canvas, 512))
        assert got is not None
        img, gsh, gsw = got
        meta = jnp.asarray([[gsh, gsw, filt]], jnp.int32)
        dev = np.asarray(device_resample(jnp.asarray(img[None]), meta, out_size=out_size))[0]
        # same input pixels, same filter math -> agree to the rounding quantum.
        # (decode_crop_resize decodes at its own DCT scale >= target; for
        # crops already below 2x target both paths decode at 8/8 identically)
        if (gsh, gsw) == crop.shape[:2]:
            assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1
        else:  # DCT scales differed; still the same resampler family
            assert np.abs(dev.astype(int) - host.astype(int)).max() <= 3
    else:  # PIL-only environment: triangle == PIL BILINEAR on the same crop
        pil = np.asarray(
            Image.fromarray(crop).resize((out_size, out_size), Image.BICUBIC if filt else Image.BILINEAR)
        )
        cimg = np.zeros((512, 512, 3), np.uint8)
        cimg[:sh, :sw] = crop
        meta = jnp.asarray([[sh, sw, filt]], jnp.int32)
        dev = np.asarray(device_resample(jnp.asarray(cimg[None]), meta, out_size=out_size))[0]
        assert np.abs(dev.astype(int) - pil.astype(int)).max() <= 2


def test_full_train_decode_parity():
    """decode_train (host resample) vs decode_train_scaled + device_resample
    with the same rng: identical crop/filter draws, pixels within ±1."""
    rng_img = np.random.default_rng(0)
    for h, w in [(500, 400), (120, 100), (900, 1400)]:
        data = _jpeg(rng_img.integers(0, 256, (h, w, 3), np.uint8))
        for seed in range(2):
            host = D.decode_train(data, np.random.default_rng(seed), 112, random_interpolation=True)
            img, sh, sw, filt = D.decode_train_scaled(
                data, np.random.default_rng(seed), 112, random_interpolation=True
            )
            assert img.shape == (D.resample_canvas(112), D.resample_canvas(112), 3)
            dev = np.asarray(
                device_resample(jnp.asarray(img[None]), jnp.asarray([[sh, sw, filt]], jnp.int32), out_size=112)
            )[0]
            assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("devresample")
    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / "train" / f"class_{c}"
        os.makedirs(d, exist_ok=True)
        for i in range(8):
            h, w = rng.integers(70, 300, 2)
            Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).save(d / f"{i}.jpg", quality=92)
    return str(root)


def test_feed_equivalence_with_host_resample(mesh8, corpus):
    """The full DeviceFeed with device_resample=True must reproduce the
    host-resample feed (same crops, same augment rng) within the resampler
    rounding quantum — switching the knob changes WHERE the resample runs,
    not the training distribution."""
    from sota_imagenet_tpu.data.pipeline import DeviceFeed, FolderLoader
    from sota_imagenet_tpu.ops.augment import build_train_augment

    kw = dict(is_train=True, batch_size=8, image_size=64, workers=2, random_interpolation=True)
    aug_kw = dict(num_classes=2, out_dtype=jnp.float32, use_pallas=False, color_twist_prob=0.5, re_prob=0.5)
    ld_host = FolderLoader(os.path.join(corpus, "train"), **kw)
    ld_dev = FolderLoader(os.path.join(corpus, "train"), device_resample=True, **kw)
    assert ld_dev.meta_kind == "resample"
    feed_host = DeviceFeed(ld_host, mesh8, build_train_augment(**aug_kw), rng=jax.random.PRNGKey(7))
    feed_dev = DeviceFeed(
        ld_dev, mesh8, build_train_augment(resample_to=64, **aug_kw), rng=jax.random.PRNGKey(7)
    )
    for bh, bd in zip(feed_host, feed_dev):
        np.testing.assert_array_equal(np.asarray(bh["label"]), np.asarray(bd["label"]))
        # normalized pixels: quantum = 1/51 per count; allow 2 counts
        diff = np.abs(np.asarray(bh["image"]) - np.asarray(bd["image"]))
        assert diff.max() <= 2.0 / 51.0 + 1e-5, diff.max()
        break
