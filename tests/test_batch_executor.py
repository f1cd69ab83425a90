"""Native batch executor (native/pipeline.cpp): one C call per batch,
double-buffered tickets, failure reporting."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="libimgpipe.so not built")


def _jpeg(size=(160, 120), seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, (8, 10, 3), np.uint8)).resize(size, Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92)
    return buf.getvalue()


def _executor():
    try:
        return native.BatchExecutor(workers=2)
    except RuntimeError as e:
        pytest.skip(str(e))


def test_batch_decode_matches_single():
    ex = _executor()
    datas = [_jpeg(seed=i) for i in range(6)]
    crops = [(10, 10, 100, 80)] * 6
    filts = [native.FILT_TRIANGULAR] * 6
    t = ex.submit(datas, crops, filts, (64, 64))
    imgs, failed = ex.wait(t)
    assert failed == []
    assert imgs.shape == (6, 64, 64, 3)
    for i in range(6):
        single = native.decode_crop_resize(datas[i], crops[i], (64, 64))
        np.testing.assert_array_equal(imgs[i], single)
    ex.close()


def test_double_buffering_tickets():
    ex = _executor()
    datas_a = [_jpeg(seed=1)] * 4
    datas_b = [_jpeg(seed=2)] * 4
    crops = [(0, 0, 0, 0)] * 4
    filts = [0] * 4
    ta = ex.submit(datas_a, crops, filts, (32, 32))
    tb = ex.submit(datas_b, crops, filts, (32, 32))  # in flight together
    imgs_a, fa = ex.wait(ta)
    imgs_b, fb = ex.wait(tb)
    assert fa == fb == []
    assert not np.array_equal(imgs_a[0], imgs_b[0])
    ex.close()


def test_failure_reporting_and_zero_fill():
    ex = _executor()
    datas = [_jpeg(seed=3), b"definitely not a jpeg", _jpeg(seed=4)]
    crops = [(0, 0, 0, 0)] * 3
    filts = [0] * 3
    t = ex.submit(datas, crops, filts, (16, 16))
    imgs, failed = ex.wait(t)
    assert failed == [1]
    assert np.all(imgs[1] == 0)  # failed slot zeroed
    assert imgs[0].any() and imgs[2].any()
    ex.close()


def test_folder_loader_uses_executor(tmp_path):
    import os

    from sota_imagenet_tpu.data.pipeline import FolderLoader

    root = tmp_path / "train"
    for cls in ["a", "b"]:
        os.makedirs(root / cls)
        for i in range(4):
            with open(root / cls / f"{i}.jpg", "wb") as f:
                f.write(_jpeg(seed=i))
    loader = FolderLoader(str(root), is_train=True, batch_size=4, image_size=32, workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert loader._batch_executor() is not None  # native path active
    imgs, labels = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and imgs.any()
    # determinism across loaders (same seed/epoch -> same crops)
    loader2 = FolderLoader(str(root), is_train=True, batch_size=4, image_size=32, workers=2)
    imgs2, labels2 = next(iter(loader2))
    np.testing.assert_array_equal(labels, labels2)
    np.testing.assert_array_equal(imgs, imgs2)
