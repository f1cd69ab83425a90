import io
import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import records as R


def test_example_roundtrip():
    ex = R.encode_example({"image/encoded": b"\x01\x02jpeg", "image/class/label": 42, "image/filename": b"a.JPEG"})
    dec = R.decode_example(ex)
    assert dec["image/encoded"] == b"\x01\x02jpeg"
    assert dec["image/class/label"] == 42
    assert dec["image/filename"] == b"a.JPEG"


def test_example_tf_compat():
    """Our hand-rolled proto must parse with real TensorFlow."""
    tf = pytest.importorskip("tensorflow")
    ex = R.encode_example({"image/encoded": b"payload", "image/class/label": 7})
    parsed = tf.train.Example.FromString(ex)
    assert parsed.features.feature["image/encoded"].bytes_list.value[0] == b"payload"
    assert parsed.features.feature["image/class/label"].int64_list.value[0] == 7
    # and the reverse: TF-written example parses with our decoder
    tf_ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "image/encoded": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"xyz"])),
                "image/class/label": tf.train.Feature(int64_list=tf.train.Int64List(value=[3])),
            }
        )
    ).SerializeToString()
    dec = R.decode_example(tf_ex)
    assert dec["image/encoded"] == b"xyz" and dec["image/class/label"] == 3


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    idx = str(tmp_path / "a.idx")
    payloads = [b"first", b"second-longer", b"x" * 1000]
    n = R.write_tfrecord(path, iter(payloads), idx)
    assert n == 3
    assert list(R.read_tfrecord(path, verify_crc=True)) == payloads
    index = R.read_index(idx)
    assert len(index) == 3
    assert R.read_record_at(path, index[1][0]) == b"second-longer"


def test_tfrecord_tf_readable(tmp_path):
    """Framing must be readable by TFRecordDataset (crc32c correctness)."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "b.tfrecord")
    R.write_tfrecord(path, iter([b"hello", b"world"]), None)
    got = [bytes(x.numpy()) for x in tf.data.TFRecordDataset(path)]
    assert got == [b"hello", b"world"]


def _make_tree(root, n_per_class=4):
    for cls in ["n01440764", "n01443537"]:
        os.makedirs(root / cls, exist_ok=True)
        for i in range(n_per_class):
            Image.new("RGB", (64, 48), (i * 30, 100, 50)).save(root / cls / f"{cls}_{i}.JPEG", "JPEG")


def test_create_records_and_loader(tmp_path):
    _make_tree(tmp_path / "train")
    _make_tree(tmp_path / "val", n_per_class=2)
    R.create_records(str(tmp_path), train_shards=2, val_shards=1, workers=1)
    assert len(os.listdir(tmp_path / "train_records")) == 2
    assert len(os.listdir(tmp_path / "train_indexes")) == 2
    loader = R.TFRecordLoader(str(tmp_path), is_train=True, batch_size=4, image_size=32, workers=2)
    batches = list(loader)
    assert len(batches) == 2
    imgs, labels = batches[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert set(np.unique(labels)).issubset({0, 1})
    # deterministic shuffle: same loader config gives same first batch labels
    loader2 = R.TFRecordLoader(str(tmp_path), is_train=True, batch_size=4, image_size=32, workers=2)
    labels2 = next(iter(loader2))[1]
    np.testing.assert_array_equal(labels, labels2)
