"""data/resize_tool.py — offline longest-side pre-resizer.

Covers the reference resize_imagenet.py contract (reference
resize_imagenet.py:9-40): longest side capped at --size with LANCZOS and
aspect preserved, already-small images passed through (re-encoded RGB JPEG,
dimensions untouched), mirror tree named ``<dir>_<size>``, skip-if-exists,
and non-image files ignored.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import resize_tool


def _write_img(path, w, h, color=(200, 30, 30)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (w, h), color).save(path)


@pytest.fixture
def tree(tmp_path):
    root = tmp_path / "raw-data"
    _write_img(str(root / "train" / "n01" / "big.jpg"), 800, 600)
    _write_img(str(root / "train" / "n01" / "tall.png"), 100, 900)
    _write_img(str(root / "val" / "n02" / "small.jpeg"), 120, 80)
    (root / "train" / "n01" / "notes.txt").write_text("not an image")
    return str(root)


def test_mirror_tree_and_sizes(tree):
    resize_tool.main([tree, "--size", "512", "--workers", "1"])
    dst = tree + "_512"

    big = Image.open(os.path.join(dst, "train", "n01", "big.jpg"))
    assert big.size == (512, 384)  # longest side 800 -> 512, aspect kept

    tall = Image.open(os.path.join(dst, "train", "n01", "tall.png"))
    assert tall.size == (56, 512)  # int(100 * 512/900) = 56
    assert tall.format == "JPEG"  # always re-encoded as JPEG q95

    small = Image.open(os.path.join(dst, "val", "n02", "small.jpeg"))
    assert small.size == (120, 80)  # under the cap: dimensions untouched
    assert small.format == "JPEG"

    assert not os.path.exists(os.path.join(dst, "train", "n01", "notes.txt"))


def test_skip_if_exists(tree):
    resize_tool.main([tree, "--size", "512", "--workers", "1"])
    out = os.path.join(tree + "_512", "train", "n01", "big.jpg")
    stamp = (os.path.getmtime(out), os.path.getsize(out))
    # second run must not rewrite existing outputs (reference skip-if-exists)
    resize_tool.main([tree, "--size", "512", "--workers", "1"])
    assert (os.path.getmtime(out), os.path.getsize(out)) == stamp


def test_resize_is_lanczos_rgb(tmp_path):
    # checkerboard downscale: LANCZOS output must match PIL's reference
    # resample exactly (the tool delegates to PIL, so this pins the filter)
    src = tmp_path / "img.jpg"
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (600, 800, 3), dtype=np.uint8)
    Image.fromarray(arr).save(str(src), quality=100, subsampling=0)
    dst = tmp_path / "out.jpg"
    resize_tool.resize_img((str(src), str(dst)), size=256)
    got = np.asarray(Image.open(str(dst)))
    want_img = Image.open(str(src)).convert("RGB").resize((256, 192), Image.LANCZOS)
    # both sides JPEG-decoded; compare against a q95 re-encode of the oracle
    import io

    buf = io.BytesIO()
    want_img.save(buf, "JPEG", quality=95)
    want = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    assert got.shape == want.shape == (192, 256, 3)
    np.testing.assert_array_equal(got, want)
