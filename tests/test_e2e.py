"""End-to-end CLI tests: real folder data through the full stack, and a
learning-dynamics sanity check (the loop must actually learn)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.config import parse_stages
from sota_imagenet_tpu.data.pipeline import DeviceFeed, SyntheticLoader
from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.ops.augment import build_val_augment
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.schedule import phases_from_stages

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _make_color_dataset(root, n_per_class=12, size=48):
    """Two trivially separable classes: red-ish vs blue-ish images."""
    rng = np.random.default_rng(0)
    for label, cls, base in ((0, "n_red", (200, 40, 40)), (1, "n_blue", (40, 40, 200))):
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            arr = np.clip(rng.normal(0, 25, (size, size, 3)) + base, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"), "JPEG", quality=92)


def test_train_cli_on_folder_data(tmp_path):
    """Full `train.py` process on a real ImageFolder tree (decode -> augment ->
    train -> eval -> checkpoint)."""
    for split in ("train", "val"):
        _make_color_dataset(tmp_path / split)
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        IMAGENET_DIR=str(tmp_path),
    )
    out = subprocess.run(
        [
            sys.executable,
            "train.py",
            "-c",
            "configs/tiny_synthetic.yaml",
            "loader.backend=folder",
            "val_loader.backend=folder",
            "loader.image_size=32",
            "loader.batch_size=16",
            "val_loader.batch_size=16",
            f"log.dir={tmp_path}/logs",
            "run.stages=[{start: 0, end: 2, lr: [0.05, 0.0]}]",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "Acc@1" in out.stdout
    # run dir artifacts (reference train.py:32-36,183-184)
    runs = list((tmp_path / "logs").rglob("model_last.ckpt"))
    assert runs, out.stdout[-2000:]


def test_loop_learns_separable_task(mesh8):
    """Color-classification must reach high accuracy in a few epochs — catches
    sign errors in loss/grad/update that shape tests can't."""

    class ColorLoader(SyntheticLoader):
        def __init__(self):
            super().__init__(batch_size=32, image_size=16, num_classes=2, length=8, seed=0)
            rng = np.random.default_rng(1)
            labels = rng.integers(0, 2, size=(self._pool.shape[0], 32)).astype(np.int32)
            pool = np.zeros_like(self._pool)
            for i in range(pool.shape[0]):
                for j in range(32):
                    base = (200, 40, 40) if labels[i, j] == 0 else (40, 40, 200)
                    pool[i, j] = np.clip(rng.normal(0, 20, (16, 16, 3)) + base, 0, 255)
            self._pool = pool.astype(np.uint8)
            self._labels = labels

    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 2]},
        ]
    )
    runner = Runner(
        model,
        CrossEntropyLoss(),
        lambda sched: build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched),
        lr_phases=phases_from_stages(parse_stages([dict(start=0, end=6, lr=[0.05, 0.05])])),
        input_dtype=jnp.float32,
    )
    runner.init_state((2, 16, 16, 3))
    feed = DeviceFeed(ColorLoader(), mesh8, build_val_augment(num_classes=2, out_dtype=jnp.float32), prefetch=1)
    train_m, _ = runner.fit(feed, None, epochs=6, start_epoch=0)
    assert train_m["Acc@1"] > 95.0, train_m


def test_train_cli_with_ema(tmp_path):
    """Regression: probe state must carry EMA fields (found by TPU soak —
    missing ema in the wd-mask probe state crashed the train step)."""
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [
            sys.executable, "train.py", "-c", "configs/tiny_synthetic.yaml",
            "run.ema_decay=0.9", f"log.dir={tmp_path}/logs",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "Acc@1" in out.stdout


def test_find_auto_resume_prefers_newest_and_skips_tmp(tmp_path):
    """auto_resume picks the newest committed checkpoint, including staged
    .new-*/.stale ones from a crash window, but never uncommitted orbax tmp
    dirs (train/checkpoint.py crash-safety contract)."""
    import os
    import time as _time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from train import find_auto_resume

    d = tmp_path / "2026-01-01_exp" / "10-00-00"
    d.mkdir(parents=True)
    names = ["model.ckpt", "model_best.ckpt", "model.ckpt.stale", "model.ckpt.new-3"]
    for i, n in enumerate(names):
        (d / n).mkdir()
        os.utime(d / n, (1000 + i, 1000 + i))
    (d / "model.ckpt.new-4.orbax-checkpoint-tmp-99").mkdir()
    os.utime(d / "model.ckpt.new-4.orbax-checkpoint-tmp-99", (2000, 2000))
    got = find_auto_resume(str(tmp_path), "exp")
    assert got == str(d / "model.ckpt.new-3"), got
    assert find_auto_resume(str(tmp_path), "otherexp") is None
