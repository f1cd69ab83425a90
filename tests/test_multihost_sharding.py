"""Per-host input sharding (replaces DALI shard_id/num_shards,
reference dali_dataloader.py:47,130): simulated by patching process_index."""

import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.data import pipeline as P
from sota_imagenet_tpu.data import records as R

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _tree(root, n=10):
    os.makedirs(root / "n01", exist_ok=True)
    for i in range(n):
        Image.new("RGB", (32, 32), (i * 20 % 255, 0, 0)).save(root / "n01" / f"{i}.jpg", "JPEG")


def test_folder_shards_disjoint_and_cover(tmp_path, monkeypatch):
    _tree(tmp_path / "train", n=10)
    shards = []
    for pi in range(2):
        monkeypatch.setattr("jax.process_index", lambda pi=pi: pi)
        monkeypatch.setattr("jax.process_count", lambda: 2)
        loader = P.FolderLoader(str(tmp_path / "train"), is_train=False, batch_size=1, image_size=16, workers=1)
        shards.append(set(loader.shard_files))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 10


def test_tfrecord_shards_disjoint_and_cover(tmp_path, monkeypatch):
    _tree(tmp_path / "train", n=8)
    _tree(tmp_path / "val", n=4)
    R.create_records(str(tmp_path), train_shards=2, val_shards=1, workers=1)
    shards = []
    for pi in range(2):
        monkeypatch.setattr("jax.process_index", lambda pi=pi: pi)
        monkeypatch.setattr("jax.process_count", lambda: 2)
        loader = R.TFRecordLoader(str(tmp_path), is_train=True, batch_size=1, image_size=16, workers=1)
        shards.append(set(loader.entries))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 8
