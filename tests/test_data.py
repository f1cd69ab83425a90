import io
import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import decode as D
from sota_imagenet_tpu.data.pipeline import FolderLoader, SyntheticLoader, scan_image_folder


def _make_jpeg(path=None, size=(300, 200), color=(120, 30, 200)):
    img = Image.new("RGB", size, color)
    if path:
        img.save(path, "JPEG", quality=95)
        return path
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_val_resize_formula():
    """crop = ceil((sz*1.14+8)//16*16) (reference dali_dataloader.py:147)."""
    assert D.val_resize_size(224) == 256
    assert D.val_resize_size(288) == 336
    assert D.val_resize_size(224, full_crop=True) == 224


def test_decode_val_shape_and_content():
    data = _make_jpeg()
    out = D.decode_val(data, 224)
    assert out.shape == (224, 224, 3)
    # solid-color image survives resize within JPEG tolerance
    assert abs(int(out[:, :, 0].mean()) - 120) < 10


def test_decode_train_shape():
    data = _make_jpeg()
    rng = np.random.default_rng(0)
    out = D.decode_train(data, rng, 160, min_area=0.08)
    assert out.shape == (160, 160, 3)
    assert out.dtype == np.uint8


def test_random_crop_distribution():
    """Area and aspect bounds match DALI's parameterization
    (dali_dataloader.py:65-72)."""
    rng = np.random.default_rng(0)
    W = H = 1000
    areas, aspects = [], []
    for _ in range(500):
        x, y, w, h = D.sample_random_crop(rng, W, H, min_area=0.08)
        assert 0 <= x <= W - w and 0 <= y <= H - h
        areas.append(w * h / (W * H))
        aspects.append(w / h)
    areas, aspects = np.asarray(areas), np.asarray(aspects)
    assert areas.min() >= 0.05 and areas.max() <= 1.001  # rounding slack
    assert aspects.min() >= 0.7 and aspects.max() <= 1.3
    # uniform area target ~ (0.08+1)/2, skewed slightly low because invalid
    # (out-of-bounds) crops are fully resampled — same retry rule as DALI
    assert 0.40 < areas.mean() < 0.60


def test_synthetic_loader_deterministic():
    a = list(SyntheticLoader(batch_size=4, image_size=8, num_classes=10, length=2, seed=1))
    b = list(SyntheticLoader(batch_size=4, image_size=8, num_classes=10, length=2, seed=1))
    np.testing.assert_array_equal(a[0][0], b[0][0])
    np.testing.assert_array_equal(a[1][1], b[1][1])


def test_folder_loader(tmp_path):
    root = tmp_path / "train"
    for cls in ["n01", "n02"]:
        os.makedirs(root / cls)
        for i in range(3):
            _make_jpeg(str(root / cls / f"{i}.jpg"))
    files, labels, classes = scan_image_folder(str(root))
    assert classes == ["n01", "n02"]
    assert len(files) == 6 and labels == [0, 0, 0, 1, 1, 1]
    loader = FolderLoader(str(root), is_train=True, batch_size=2, image_size=32, workers=2)
    batches = list(loader)
    assert len(batches) == 3
    imgs, labs = batches[0]
    assert imgs.shape == (2, 32, 32, 3) and labs.shape == (2,)


def test_augment_normalization(mesh8=None):
    import jax
    import jax.numpy as jnp

    from sota_imagenet_tpu.ops.augment import build_train_augment, build_val_augment

    aug = build_val_augment(num_classes=10, out_dtype=jnp.float32)
    imgs = np.full((4, 8, 8, 3), 128, np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.int32)
    out = aug(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(labels))
    # (128 - 127.5)/51 ≈ 0.0098
    assert abs(float(out["image"].mean()) - (128 - 127.5) / 51.0) < 1e-3
    assert out["label"].shape == (4, 10)
    np.testing.assert_allclose(np.asarray(out["label"]).sum(-1), 1.0)

    taug = build_train_augment(num_classes=10, re_prob=0.5, color_twist_prob=0.5, gray_prob=0.2, out_dtype=jnp.float32)
    tout = taug(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(labels))
    assert tout["image"].shape == (4, 8, 8, 3)
    assert np.isfinite(np.asarray(tout["image"])).all()
