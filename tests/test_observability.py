"""Observability: TensorBoard scalars + histogram callbacks write real event
files (reference TB callback + WeightDistributionTB, train.py:139-140)."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.config import parse_stages
from sota_imagenet_tpu.data.pipeline import DeviceFeed, SyntheticLoader
from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.ops.augment import build_val_augment
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train.callbacks import (
    GradDistributionTB,
    SpectralDistributionTB,
    TensorBoard,
    Timer,
    WeightDistributionTB,
)
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.schedule import phases_from_stages
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def test_tensorboard_and_histograms(tmp_path, mesh8):
    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 10]},
        ]
    )
    callbacks = [
        TensorBoard(str(tmp_path), log_every=1),
        WeightDistributionTB(),
        SpectralDistributionTB(),
        GradDistributionTB(log_every=2),
        Timer(),
    ]
    runner = Runner(
        model,
        CrossEntropyLoss(),
        lambda sched: build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched),
        lr_phases=phases_from_stages(parse_stages([dict(start=0, end=1, lr=[0.1, 0.1])])),
        input_dtype=jnp.float32,
        callbacks=callbacks,
    )
    runner.init_state((2, 16, 16, 3))
    host = SyntheticLoader(batch_size=16, image_size=16, num_classes=10, length=4)
    feed = DeviceFeed(host, mesh8, build_val_augment(num_classes=10, out_dtype=jnp.float32), prefetch=1)
    train_m, _ = runner.fit(feed, feed, epochs=1, start_epoch=0)
    runner.close()
    events = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert events, os.listdir(tmp_path)
    assert os.path.getsize(events[0]) > 500  # scalars + histograms written
    assert "input_utilization" in train_m and 0 <= train_m["input_utilization"] <= 1

    # The scalar/histogram callbacks BUFFER device values during the epoch and
    # flush once at epoch end (a per-step float() is a D2H readback: ~30 ms
    # RTT tunneled, dispatch-serializing on real TPU VMs; PERF.md round 4) —
    # assert the flush really wrote per-step events with their original steps.
    # full `tensorboard` is NOT in the pin set (only tensorboardX writes);
    # the readback assertions are extra rigor where the package exists
    tb_ea = pytest.importorskip("tensorboard.backend.event_processing.event_accumulator")
    EventAccumulator = tb_ea.EventAccumulator

    acc = EventAccumulator(str(tmp_path), size_guidance={"histograms": 0})
    acc.Reload()
    loss_events = acc.Scalars("train/loss")
    assert [e.step for e in loss_events] == [0, 1, 2, 3], loss_events
    assert all(np.isfinite(e.value) for e in loss_events)
    hists = acc.Tags()["histograms"]
    assert "optim/model_params_log" in hists, hists
    h = acc.Histograms("optim/model_params_log")
    assert [e.step for e in h] == [0, 2] and sum(h[0].histogram_value.bucket) > 0
