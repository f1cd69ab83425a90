"""End-to-end training-loop tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.config import parse_stages
from sota_imagenet_tpu.data.pipeline import DeviceFeed, SyntheticLoader
from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.ops.augment import build_train_augment, build_val_augment
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train.callbacks import CutmixMixup
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.schedule import make_lr_schedule, phases_from_stages
from sota_imagenet_tpu.train import steps as steps_lib

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def tiny_model():
    cfg = [
        {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
        {"module": "BatchNorm2d", "args": [8]},
        {"module": "ReLU"},
        {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
        {"module": "Linear", "args": [8, 10]},
    ]
    return CModel(layer_config=cfg)


def make_runner(mesh, ema_decay=0.0, accumulate_steps=1, callbacks=None):
    stages = parse_stages([dict(start=0, end=2, lr=[0.1, 0.1])])
    return Runner(
        tiny_model(),
        CrossEntropyLoss(smoothing=0.1),
        lambda sched: build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched),
        lr_phases=phases_from_stages(stages),
        accumulate_steps=accumulate_steps,
        ema_decay=ema_decay,
        input_dtype=jnp.float32,
        callbacks=callbacks or [],
    )


def make_feed(mesh, bs=16, size=16, n=4, train=True):
    host = SyntheticLoader(batch_size=bs, image_size=size, num_classes=10, length=n)
    aug = (
        build_train_augment(num_classes=10, out_dtype=jnp.float32)
        if train
        else build_val_augment(num_classes=10, out_dtype=jnp.float32)
    )
    return DeviceFeed(host, mesh, aug, prefetch=1)


def test_fit_reduces_loss(mesh8):
    runner = make_runner(mesh8)
    runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=8)
    val = make_feed(mesh8, n=2, train=False)
    train_m, val_m = runner.fit(feed, val, epochs=2, start_epoch=0)
    assert "loss" in train_m and np.isfinite(train_m["loss"])
    assert "Acc@1" in val_m
    assert int(runner.state.step) == 16


def test_state_sharded_over_mesh(mesh8):
    runner = make_runner(mesh8)
    runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=2)
    runner.fit(feed, None, epochs=1, start_epoch=0)
    batch = next(iter(make_feed(mesh8, n=1)))
    # batch sharded over 8 devices on the 'data' axis
    assert len(batch["image"].sharding.device_set) == 8


def test_accumulation_matches_large_batch(mesh8):
    """grad accumulation == big batch for a linear model w/o BN."""
    sched = lambda s: jnp.asarray(0.5, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    model = CModel(
        layer_config=[
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [3, 10]},
        ]
    )
    crit = CrossEntropyLoss()
    step1 = steps_lib.build_train_step(model, crit, tx, sched, accumulate_steps=1, input_dtype=jnp.float32)
    step2 = steps_lib.build_train_step(model, crit, tx, sched, accumulate_steps=4, input_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (16, 8, 8, 3))
    labels = jax.nn.one_hot(jax.random.randint(rng, (16,), 0, 10), 10)
    batch = {"image": images, "label": labels}
    s0 = steps_lib.init_state(model, tx, (2, 8, 8, 3), rng)
    s1, _ = step1(s0, batch, rng)
    s0b = steps_lib.init_state(model, tx, (2, 8, 8, 3), rng)
    s2, _ = step2(s0b, batch, rng)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_ema_moves_toward_params(mesh8):
    runner = make_runner(mesh8, ema_decay=0.5)
    runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=4)
    runner.fit(feed, None, epochs=1, start_epoch=0)
    # EMA exists and differs from params but not wildly
    p = jax.tree_util.tree_leaves(runner.state.params)[0]
    e = jax.tree_util.tree_leaves(runner.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_ema_batch_stats_are_averaged(mesh8):
    """EMA buffers follow the same decay as EMA params (reference ModelEma
    averages the full state_dict incl. BN buffers, train.py:111-114) — the EMA
    copy must NOT just mirror the instantaneous batch_stats."""
    decay = 0.5
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    model = tiny_model()
    crit = CrossEntropyLoss()
    step = steps_lib.build_train_step(model, crit, tx, sched, ema_decay=decay, input_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(rng, (8, 16, 16, 3)) * 3.0 + 1.0,
        "label": jax.nn.one_hot(jax.random.randint(rng, (8,), 0, 10), 10),
    }
    s0 = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng, ema_decay=decay, input_dtype=jnp.float32)
    s1, _ = step(s0, batch, rng)
    want = jax.tree_util.tree_map(lambda e, b: e * decay + b * (1 - decay), s0.ema_batch_stats, s1.batch_stats)
    for w, got, inst in zip(
        jax.tree_util.tree_leaves(want),
        jax.tree_util.tree_leaves(s1.ema_batch_stats),
        jax.tree_util.tree_leaves(s1.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(w), rtol=1e-6)
        assert not np.allclose(np.asarray(got), np.asarray(inst))


def test_cutmix_mixup_step_option(mesh8):
    runner = make_runner(mesh8, callbacks=[CutmixMixup(1.0, 0.2, prob=1.0)])
    runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=2)
    train_m, _ = runner.fit(feed, None, epochs=1, start_epoch=0)
    assert np.isfinite(train_m["loss"])


def test_sam_step_runs(mesh8):
    from sota_imagenet_tpu.train.callbacks import SAM

    runner = make_runner(mesh8, callbacks=[SAM(unitwise=True, rho=0.01)])
    runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=2)
    train_m, _ = runner.fit(feed, None, epochs=1, start_epoch=0)
    assert np.isfinite(train_m["loss"])


def test_sam_with_accumulation_microbatches_second_pass(mesh8):
    """The SAM perturbed pass must go through the same microbatch scan as the
    clean pass (memory bound!). For a BN-free linear model, accumulated SAM
    grads equal full-batch SAM grads, so one step must produce identical
    params."""
    sched = lambda s: jnp.asarray(0.5, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    model = CModel(
        layer_config=[
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [3, 10]},
        ]
    )
    crit = CrossEntropyLoss()
    sam = {"kind": "asam", "rho": 0.05}
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (16, 8, 8, 3))
    labels = jax.nn.one_hot(jax.random.randint(rng, (16,), 0, 10), 10)
    batch = {"image": images, "label": labels}

    def run(acc):
        step = steps_lib.build_train_step(model, crit, tx, sched, accumulate_steps=acc, sam=sam, input_dtype=jnp.float32)
        s0 = steps_lib.init_state(model, tx, (2, 8, 8, 3), rng)
        s1, _ = step(s0, batch, rng)
        return s1.params

    p1, p4 = run(1), run(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sam_bn_semantics(mesh8):
    """Reference SAM's perturbed forward ALSO updates BN running stats
    (callbacks.py:313-317) — bn_from_perturbed=True (default) matches that;
    False keeps the clean pass's stats (== the no-SAM update exactly)."""
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    model = tiny_model()
    crit = CrossEntropyLoss()
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(rng, (8, 16, 16, 3)) * 2.0,
        "label": jax.nn.one_hot(jax.random.randint(rng, (8,), 0, 10), 10),
    }

    def run(sam):
        s0 = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng)
        step = steps_lib.build_train_step(model, crit, tx, sched, sam=sam, input_dtype=jnp.float32)
        s1, _ = step(s0, batch, rng)
        return s1.batch_stats

    bs_ref = run({"kind": "asam", "rho": 0.05, "bn_from_perturbed": True})
    bs_clean = run({"kind": "asam", "rho": 0.05, "bn_from_perturbed": False})
    bs_nosam = run(None)
    # clean mode == the single-forward update
    for a, b in zip(jax.tree_util.tree_leaves(bs_clean), jax.tree_util.tree_leaves(bs_nosam)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # reference mode applied a second update on top
    diffs = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(bs_ref), jax.tree_util.tree_leaves(bs_nosam))
    ]
    assert any(diffs)


def test_sam_stateful_loss_advances_twice(mesh8):
    """With bn_from_perturbed=True the stateful criterion (AdaCos) is called
    on BOTH forwards like the reference (callbacks.py:315), so its running
    state after one step differs from the clean-pass-only mode."""
    from sota_imagenet_tpu.losses.angular import AdaCos

    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    model = tiny_model()
    crit = AdaCos(momentum=0.5)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(rng, (8, 16, 16, 3)),
        "label": jax.nn.one_hot(jax.random.randint(rng, (8,), 0, 10), 10),
    }

    def run(bn_from_perturbed):
        s0 = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng, criterion=crit)
        step = steps_lib.build_train_step(
            model,
            crit,
            tx,
            sched,
            sam={"kind": "asam", "rho": 0.5, "bn_from_perturbed": bn_from_perturbed},
            input_dtype=jnp.float32,
        )
        s1, _ = step(s0, batch, rng)
        return s1.loss_state

    ls_ref = run(True)
    ls_clean = run(False)
    leaves_differ = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ls_ref), jax.tree_util.tree_leaves(ls_clean))
    ]
    assert any(leaves_differ)


def test_spectral_norm_end_to_end(mesh8):
    """ForwardSpectralNorm: persistent u/v state initializes into TrainState,
    advances during fit, and eval runs with it."""
    from sota_imagenet_tpu.models.parametrize import SPECTRAL_STATE_KEY
    from sota_imagenet_tpu.train.callbacks import ForwardSpectralNorm

    runner = make_runner(mesh8, callbacks=[ForwardSpectralNorm()])
    runner.init_state((2, 16, 16, 3))
    assert SPECTRAL_STATE_KEY in runner.state.batch_stats
    u0 = np.asarray(next(iter(runner.state.batch_stats[SPECTRAL_STATE_KEY].values()))["u"])
    feed = make_feed(mesh8, n=2)
    val = make_feed(mesh8, n=1, train=False)
    train_m, val_m = runner.fit(feed, val, epochs=1, start_epoch=0)
    assert np.isfinite(train_m["loss"]) and "Acc@1" in val_m
    u1 = np.asarray(next(iter(runner.state.batch_stats[SPECTRAL_STATE_KEY].values()))["u"])
    assert not np.allclose(u0, u1)


def test_checkpoint_roundtrip(tmp_path, mesh8):
    from sota_imagenet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    runner = make_runner(mesh8)
    state = runner.init_state((2, 16, 16, 3))
    path = save_checkpoint(str(tmp_path), state, epoch=3)
    restored, epoch = load_checkpoint(path, state)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_partial_restore_keeps_ema(tmp_path, mesh8):
    """A checkpoint saved WITHOUT optimizer state (log.save_optim=false, the
    reference default) must still restore params, batch_stats and EMA copies.
    The step counter intentionally stays at the template's 0 so the fresh
    optimizer count and the base_step-anchored lr schedule stay consistent
    (checkpoint.py partial-restore contract)."""
    from sota_imagenet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    runner = make_runner(mesh8, ema_decay=0.5)
    state = runner.init_state((2, 16, 16, 3))
    feed = make_feed(mesh8, n=2)
    runner.fit(feed, None, epochs=1, start_epoch=0)  # EMA now differs from init
    trained = runner.state
    stripped = trained.replace(opt_state=None)  # CheckpointSaver include_optimizer=False
    path = save_checkpoint(str(tmp_path), stripped, epoch=1)

    template = make_runner(mesh8, ema_decay=0.5).init_state((2, 16, 16, 3))
    restored, epoch = load_checkpoint(path, template)
    assert epoch == 1
    # step must stay at the template's 0: the fresh optimizer's schedule
    # count restarts at 0 and the Runner anchors lr with base_step=state.step
    # — restoring step without opt_state would desync the APPLIED lr
    assert int(restored.step) == 0
    for name in ("params", "batch_stats", "ema_params", "ema_batch_stats"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(trained, name)), jax.tree_util.tree_leaves(getattr(restored, name))
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # EMA is the trained average, not a fresh copy of the template's params
    t0 = jax.tree_util.tree_leaves(template.ema_params)[0]
    r0 = jax.tree_util.tree_leaves(restored.ema_params)[0]
    assert not np.allclose(np.asarray(t0), np.asarray(r0))


def test_checkpoint_wrong_model_fails_loudly(tmp_path, mesh8):
    """Restoring a checkpoint into a DIFFERENT model's template must raise,
    not 'resume' at epoch N with fresh random weights."""
    import pytest as _pytest

    from sota_imagenet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    runner = make_runner(mesh8)
    state = runner.init_state((2, 16, 16, 3))
    path = save_checkpoint(str(tmp_path), state.replace(opt_state=None), epoch=2)

    other_model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 4]},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [4, 10]},
        ]
    )
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    template = steps_lib.init_state(other_model, tx, (2, 16, 16, 3), jax.random.PRNGKey(0))
    with _pytest.raises(Exception):
        load_checkpoint(path, template)
