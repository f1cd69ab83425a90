"""Decode-free packed records (data/packed.py): writer conventions, loader
semantics, and parity with the online decode path.

The packed path replaces the training-time JPEG decode with dataset-build
-time decode (round-3 VERDICT #2; reference anchor: create_records.py:55-56
plus DALI's reason to exist, dali_dataloader.py:44-124)."""

import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import decode as D
from sota_imagenet_tpu.data import packed as P
from sota_imagenet_tpu.data import records as R


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny ImageFolder tree: 3 classes x 8 images, varied sizes."""
    root = tmp_path_factory.mktemp("packed_corpus")
    rng = np.random.default_rng(0)
    for split, n_per in (("train", 8), ("val", 4)):
        for c in range(3):
            d = root / split / f"class_{c}"
            d.mkdir(parents=True)
            for i in range(n_per):
                w, h = int(rng.integers(40, 90)), int(rng.integers(40, 90))
                arr = rng.integers(0, 256, (h, w, 3), np.uint8)
                Image.fromarray(arr).save(d / f"img_{c}_{i}.jpg", quality=92)
    P.create_packed_records(str(root), image_size=32, train_shards=4, val_shards=2, workers=1)
    return str(root)


def test_writer_layout(corpus):
    tr, tri = P.packed_dirs(corpus, "train")
    va, vai = P.packed_dirs(corpus, "val")
    assert sorted(os.listdir(tr)) == [f"train-{i:05d}-of-00004" for i in range(4)]
    assert sorted(os.listdir(va)) == [f"val-{i:05d}-of-00002" for i in range(2)]
    # idx files parse and framing matches: payload slice at off+12 len-16
    name = sorted(os.listdir(tr))[0]
    idx = R.read_index(os.path.join(tri, name + ".idx"))
    assert len(idx) > 0
    with open(os.path.join(tr, name), "rb") as f:
        data = f.read()
    off, size = idx[0]
    ex = R.decode_example(data[off + 12 : off + size - 4])
    assert ex["image/height"] == 32 and ex["image/width"] == 32
    assert len(ex["image/raw"]) == 32 * 32 * 3
    assert 0 <= ex["image/class/label"] < 3


def test_train_crop_matches_online_decode(corpus):
    """A packed train sample must be BIT-identical to decode_train with the
    writer's rng keying ((seed, rep, source_index) over the seed-42 global
    shuffle order) — the packed path changes WHEN decode happens, not what."""
    from sota_imagenet_tpu.data.pipeline import scan_image_folder

    files, labels, _ = scan_image_folder(os.path.join(corpus, "train"))
    # reconstruct writer order: shuffle(seed), rep 0
    order = np.arange(len(files))
    np.random.default_rng(R.SHUFFLE_SEED).shuffle(order)
    # read every packed train record into {filename: (img, label)}
    got = {}
    rec_dir, idx_dir = P.packed_dirs(corpus, "train")
    for name in sorted(os.listdir(rec_dir)):
        for payload in R.read_tfrecord(os.path.join(rec_dir, name)):
            ex = R.decode_example(payload)
            img = np.frombuffer(ex["image/raw"], np.uint8).reshape(32, 32, 3)
            got[ex["image/filename"].decode()] = (img, int(ex["image/class/label"]))
    assert len(got) == len(files)
    for i in order[:6]:  # spot-check a handful
        rng = np.random.default_rng((R.SHUFFLE_SEED, 0, int(i)))
        want = D.decode_train(files[i], rng, 32)
        img, label = got[os.path.basename(files[i])]
        np.testing.assert_array_equal(img, want)
        assert label == labels[i]


def test_val_matches_online_decode(corpus):
    from sota_imagenet_tpu.data.pipeline import scan_image_folder

    files, labels, _ = scan_image_folder(os.path.join(corpus, "val"))
    by_name = {os.path.basename(f): (f, l) for f, l in zip(files, labels)}
    rec_dir, _ = P.packed_dirs(corpus, "val")
    checked = 0
    for name in sorted(os.listdir(rec_dir)):
        for payload in R.read_tfrecord(os.path.join(rec_dir, name)):
            ex = R.decode_example(payload)
            img = np.frombuffer(ex["image/raw"], np.uint8).reshape(32, 32, 3)
            f, l = by_name[ex["image/filename"].decode()]
            np.testing.assert_array_equal(img, D.decode_val(f, 32))
            assert int(ex["image/class/label"]) == l
            checked += 1
    assert checked == len(files)


def test_loader_train_semantics(corpus):
    ld = P.PackedLoader(corpus, is_train=True, batch_size=8, image_size=32)
    assert len(ld) == 24 // 8
    epoch0 = [b for b in ld]
    assert all(im.shape == (8, 32, 32, 3) and im.dtype == np.uint8 for im, _ in epoch0)
    assert all(lb.dtype == np.int32 for _, lb in epoch0)
    # auto epoch bump -> different shuffle order
    epoch1 = [b for b in ld]
    assert not all(np.array_equal(a[0], b[0]) for a, b in zip(epoch0, epoch1))
    # deterministic: fresh loader with same seed/epoch reproduces epoch 0
    ld2 = P.PackedLoader(corpus, is_train=True, batch_size=8, image_size=32)
    for (a, la), (b, lb) in zip(epoch0, ld2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


def test_loader_val_tail_mask(corpus):
    ld = P.PackedLoader(corpus, is_train=False, batch_size=5, image_size=32, drop_last=False)
    batches = list(ld)
    assert len(ld) == 3  # 12 val imgs / bs 5 -> 2 full + tail
    imgs, labels, mask = batches[-1]
    assert imgs.shape == (5, 32, 32, 3) and mask.tolist() == [1.0, 1.0, 0.0, 0.0, 0.0]
    assert (labels[2:] == -1).all()
    total_real = sum(int(m.sum()) for _, _, m in batches)
    assert total_real == 12


def test_loader_size_mismatch_raises(corpus):
    with pytest.raises(ValueError, match="rebuild with create_packed_records"):
        P.PackedLoader(corpus, is_train=True, batch_size=4, image_size=64)


def test_crops_per_image(tmp_path):
    rng = np.random.default_rng(1)
    for c in range(2):
        d = tmp_path / "train" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (50, 60, 3), np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.jpg", quality=92)
    P.create_packed_records(
        str(tmp_path), image_size=24, train_shards=2, workers=1, crops_per_image=2, splits=("train",)
    )
    ld = P.PackedLoader(str(tmp_path), is_train=True, batch_size=3, image_size=24)
    assert len(ld.entries) == 12  # 6 images x 2 crops


def test_build_loader_packed_backend(corpus, mesh8):
    """The packed backend must slot into build_loader + DeviceFeed + the
    on-device augment exactly like the JPEG backends."""
    import jax.numpy as jnp

    from sota_imagenet_tpu.config import ConfigNode
    from sota_imagenet_tpu.data.pipeline import build_loader

    cfg = ConfigNode(
        {
            "image_size": 32,
            "batch_size": 8,
            "num_classes": 3,
            "root_data_dir": corpus,
            "use_packed": True,
            "backend": "auto",
            "workers": 1,
            "prefetch": 1,
        }
    )
    import jax

    feed = build_loader(cfg, jax.sharding.Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1), ("data", "spatial", "model")), is_train=True, rng=jax.random.PRNGKey(0))
    batch = next(iter(feed))
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["image"].dtype == jnp.bfloat16
    assert batch["label"].shape == (8, 3)
