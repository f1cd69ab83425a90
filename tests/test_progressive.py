"""Progressive-resolution training: stage boundaries rebuild loaders and the
jitted step retraces at the new static shapes (reference DaliDataManager,
dali_dataloader.py:213-239; SURVEY.md §5.7 — 'recompile at new static shapes
per stage')."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.config import ConfigNode, load
from sota_imagenet_tpu.data.pipeline import DataManager
from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.schedule import phases_from_stages
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def test_stage_rebuild_and_training(mesh8):
    cfg = load(strict_env=False)
    cfg.loader.backend = "synthetic"
    cfg.val_loader.backend = "synthetic"
    cfg.loader.batch_size = 16
    cfg.val_loader.batch_size = 16
    cfg.loader.image_size = 24
    cfg.run.stages = [
        dict(start=0, end=1, lr=[0.05, 0.05], extra_args=dict(image_size=16, batch_size=16)),
        dict(start=1, end=2, lr=[0.05, 0.0], extra_args=dict(image_size=24, batch_size=8)),
    ]
    dm = DataManager(cfg, mesh8, out_dtype=jnp.float32)
    assert len(dm) == 2

    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 1000]},
        ]
    )
    from sota_imagenet_tpu.config import parse_stages

    runner = Runner(
        model,
        CrossEntropyLoss(),
        lambda sched: build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched),
        lr_phases=phases_from_stages(parse_stages(cfg.run.stages)),
        input_dtype=jnp.float32,
    )
    runner.init_state((2, 16, 16, 3))

    seen_shapes = []
    for idx in range(len(dm)):
        dm.set_stage(idx)
        batch = next(iter(dm.loader))
        seen_shapes.append(tuple(batch["image"].shape))
        runner.fit(dm.loader, dm.val_loader, epochs=dm.end_epoch, start_epoch=dm.start_epoch, steps_per_epoch=2, val_steps=1)
    # stage 1: 16px/bs16, stage 2: 24px/bs8 — loaders really rebuilt
    assert seen_shapes[0] == (16, 16, 16, 3)
    assert seen_shapes[1] == (8, 24, 24, 3)
    assert int(runner.state.step) == 4  # 2 stages x 2 steps
    # val image size follows train (dali_dataloader.py:228)
    vbatch = next(iter(dm.val_loader))
    assert vbatch["image"].shape[1] == 24


def test_lr_only_stage_keeps_loader(mesh8):
    cfg = load(strict_env=False)
    cfg.loader.backend = "synthetic"
    cfg.val_loader.backend = "synthetic"
    cfg.loader.batch_size = 8
    cfg.val_loader.batch_size = 8
    cfg.run.stages = [dict(start=0, end=1, lr=[0.1, 0.1]), dict(start=1, end=2, lr=[0.1, 0.0])]
    dm = DataManager(cfg, mesh8, out_dtype=jnp.float32)
    dm.set_stage(0)
    loader0 = dm.loader
    dm.set_stage(1)
    assert dm.loader is loader0  # no extra_args -> reuse (dali_dataloader.py:217-218)


def test_accumulate_steps_scales_effective_batch(mesh8):
    """reference semantics: accumulate_steps multiplies the effective batch
    (runner accumulated across loader batches, arg_parser.py:86)."""
    import jax.numpy as jnp

    from sota_imagenet_tpu.config import load
    from sota_imagenet_tpu.data.pipeline import DataManager

    cfg = load(strict_env=False)
    cfg.loader.backend = "synthetic"
    cfg.val_loader.backend = "synthetic"
    cfg.loader.batch_size = 8
    cfg.val_loader.batch_size = 8
    cfg.run.accumulate_steps = 2
    cfg.run.stages = [dict(start=0, end=1, lr=[0.1, 0.1])]
    dm = DataManager(cfg, mesh8, out_dtype=jnp.float32)
    dm.set_stage(0)
    batch = next(iter(dm.loader))
    assert batch["image"].shape[0] == 16  # 8 * accumulate_steps
    vbatch = next(iter(dm.val_loader))
    assert vbatch["image"].shape[0] == 8  # val unaffected


def test_pinned_val_size_survives_stages(mesh8):
    """val_loader.follow_train_size=false pins an explicit val image size
    across stage rebuilds (legacy flat-schema `val_sz`, e.g. BResNet50_encoder
    validates at 288 while training at 224)."""
    cfg = load(strict_env=False)
    cfg.loader.backend = "synthetic"
    cfg.val_loader.backend = "synthetic"
    cfg.loader.batch_size = 8
    cfg.val_loader.batch_size = 8
    cfg.loader.image_size = 16
    cfg.val_loader.image_size = 32
    cfg.val_loader.follow_train_size = False
    cfg.run.stages = [
        dict(start=0, end=1, lr=[0.05, 0.05]),
        dict(start=1, end=2, lr=[0.05, 0.0], extra_args=dict(image_size=24)),
    ]
    dm = DataManager(cfg, mesh8, out_dtype=jnp.float32)
    for idx, train_sz in ((0, 16), (1, 24)):
        dm.set_stage(idx)
        assert next(iter(dm.loader))["image"].shape[1] == train_sz
        assert next(iter(dm.val_loader))["image"].shape[1] == 32  # pinned
