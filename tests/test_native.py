"""Native decode core (native/imgpipe.cpp) parity vs the PIL path."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import decode as D
from sota_imagenet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="libimgpipe.so not built")


def _jpeg(size=(320, 240), seed=0, quality=92):
    rng = np.random.default_rng(seed)
    # smooth random image (noise compresses badly and decodes with artifacts)
    small = rng.integers(0, 256, (12, 16, 3), np.uint8)
    img = Image.fromarray(small).resize(size, Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_dims():
    data = _jpeg((320, 240))
    assert native.jpeg_dims(data) == (320, 240)
    assert native.jpeg_dims(b"not a jpeg") is None


def test_full_decode_matches_pil():
    data = _jpeg((128, 96))
    out = native.decode_crop_resize(data, (0, 0, 0, 0), (128, 96))
    assert out is not None and out.shape == (96, 128, 3)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)  # same libjpeg → bit-identical


def test_crop_resize_close_to_pil():
    data = _jpeg((320, 240))
    crop = (40, 30, 200, 150)
    out = native.decode_crop_resize(data, crop, (112, 112), native.FILT_TRIANGULAR)
    ref_img = Image.open(io.BytesIO(data)).convert("RGB").crop((40, 30, 240, 180)).resize((112, 112), Image.BILINEAR)
    ref = np.asarray(ref_img)
    # the native path decodes at a DCT-reduced scale before the final resize
    # (fused decode+crop, like DALI) — so not bit-identical to PIL's
    # full-res crop+resize, but statistically very close
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert np.mean(diff) < 5.0, np.mean(diff)
    assert np.percentile(diff, 99) <= 16


def test_val_path_matches_python():
    data = _jpeg((300, 200))
    out = native.decode_val(data, 256, 224)
    ref = D.decode_val(data, 224, use_native=False)
    assert out.shape == ref.shape == (224, 224, 3)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    # PIL draft-mode decodes at a coarser scale before resizing; allow slack
    assert np.mean(diff) < 6.0, np.mean(diff)


def test_decode_train_uses_native_same_distribution():
    data = _jpeg((320, 240))
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a = D.decode_train(data, rng1, 64, use_native=True)
    b = D.decode_train(data, rng2, 64, use_native=False)
    assert a.shape == b.shape == (64, 64, 3)
    # same crop sampled (same rng) — images agree closely despite different decoders
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert np.mean(diff) < 8.0, np.mean(diff)


def test_native_is_faster_than_pil():
    data = _jpeg((640, 480), quality=95)
    rng = np.random.default_rng(0)
    n = 15
    t0 = time.perf_counter()
    for i in range(n):
        D.decode_train(data, np.random.default_rng(i), 224, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n):
        D.decode_train(data, np.random.default_rng(i), 224, use_native=False)
    t_pil = time.perf_counter() - t0
    # don't assert hard (CI noise) but record; native should not be slower by much
    print(f"native {t_native:.3f}s vs PIL {t_pil:.3f}s")
    assert t_native < t_pil * 2.0


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_skip_scanlines_bit_identical(subsampling):
    """The crop fast path skips rows above the crop with jpeg_skip_scanlines
    (imgpipe.cpp). libjpeg-turbo documents possible context-row differences
    for subsampled JPEGs around the resume point; on the pinned libjpeg this
    is measured bit-identical at every offset (incl. non-MCU-aligned). This
    pins that: a diff here means the skip path must revert to read-and-discard."""
    rng = np.random.default_rng(1)
    img = Image.fromarray((rng.random((256, 320, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92, subsampling=subsampling)
    data = buf.getvalue()
    w, h = native.jpeg_dims(data)
    full = native.decode_crop_resize(data, (0, 0, w, h), (w, h))
    for y0 in (1, 7, 8, 15, 16, 33, 129):
        ch = 64
        out = native.decode_crop_resize(data, (0, y0, w, ch), (w, ch))
        np.testing.assert_array_equal(out, full[y0 : y0 + ch])
