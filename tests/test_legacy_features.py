"""Tests for the legacy flat-schema (`configs/_old_configs`) support surface:
BinaryFocalLoss / smoothed BinaryKLDiv, criterion aliases, `lr_ep` phase
spans + poly mode, `classes_divisor`, `sigmoid_trick`, the BNet `sphere_mlp`
head, and stage-aware CutmixMixup stop.

Reference anchors: the old trainer's flat schema as consumed by
/root/reference/configs/_old_configs/*/ *.yaml (e.g. exp91 a-focal params,
exp76 kld+smoothing, effnetb0_tf poly mode, resnet34_best multi-stage cos).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu import registry
from sota_imagenet_tpu.losses import BinaryFocalLoss, BinaryKLDivLoss

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


# --------------------------------------------------------------------------- #
# BinaryFocalLoss
# --------------------------------------------------------------------------- #


def _np_binary_focal(logits, onehot, gamma=2.0, alpha=-1.0, combine_thr=0.0, temperature=None):
    """Numpy oracle of binary (sigmoid) focal loss with the Reduced Focal
    variant (arXiv:1903.01347) above combine_thr."""
    z = logits.astype(np.float64)
    if temperature is not None:
        z = z / temperature
    t = onehot.astype(np.float64)
    p = 1.0 / (1.0 + np.exp(-z))
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    p_t = p * t + (1 - p) * (1 - t)
    if combine_thr > 0:
        focal = np.where(p_t < combine_thr, 1.0, ((1.0 - p_t) / (1.0 - combine_thr)) ** gamma)
    else:
        focal = (1.0 - p_t) ** gamma
    loss = focal * bce
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    return loss.sum(axis=-1).mean()


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(alpha=0.5),
        dict(combine_thr=0.5, alpha=0.5),
        dict(temperature=0.2, combine_thr=0.5, alpha=0.5),  # exp91 a-focal params
    ],
)
def test_binary_focal_matches_numpy(kw):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 12)).astype(np.float32)
    labels = rng.integers(0, 12, size=(8,))
    onehot = np.eye(12)[labels]
    got = float(BinaryFocalLoss(**kw)(jnp.asarray(logits), jnp.asarray(labels)))
    want = _np_binary_focal(logits, onehot, **kw)
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_binary_focal_reduced_is_bce_below_thr():
    # with p_t < thr everywhere, reduced focal == plain sigmoid BCE
    logits = jnp.zeros((4, 6))  # p = 0.5 for every class
    labels = jnp.asarray([0, 1, 2, 3])
    rfl = BinaryFocalLoss(gamma=2.0, combine_thr=0.51)(logits, labels)
    bce = BinaryFocalLoss(gamma=0.0)(logits, labels)
    assert np.isclose(float(rfl), float(bce), rtol=1e-6)


def test_binary_kl_smoothing_equals_presmoothed_targets():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4])
    onehot = jax.nn.one_hot(labels, 10)
    s = 0.01
    smoothed = onehot * (1 - s) + s / 10
    a = BinaryKLDivLoss(smoothing=s)(logits, labels)
    b = BinaryKLDivLoss()(logits, smoothed)
    assert np.isclose(float(a), float(b), rtol=1e-6)


def test_legacy_criterion_aliases_resolve():
    # legacy flat-schema names → canonical criteria
    from sota_imagenet_tpu.losses import CrossEntropyLoss, SigmoidLoss
    from sota_imagenet_tpu.losses.angular import AdaCos, ArcCosSoftmax

    assert registry.resolve("a-softmax") is CrossEntropyLoss
    assert registry.resolve("a-focal") is BinaryFocalLoss
    assert registry.resolve("kld") is BinaryKLDivLoss
    assert registry.resolve("sigmoid") is SigmoidLoss
    assert registry.resolve("mlp_adacos") is AdaCos
    assert registry.resolve("arc-softmax") is ArcCosSoftmax


# --------------------------------------------------------------------------- #
# Schedule: lr_ep spans + poly mode
# --------------------------------------------------------------------------- #


def test_lr_ep_phase_spans_multiple_stages():
    """resnet34_best pattern: one cos phase over [0,200] while data stages
    change at 60/120/180 — consecutive stages carrying the same lr_ep
    deduplicate into ONE phase, and the schedule is continuous across the
    stage boundaries."""
    from sota_imagenet_tpu.config import parse_stages
    from sota_imagenet_tpu.train.schedule import make_lr_schedule, phases_from_stages

    stages = parse_stages(
        [
            dict(start=0, end=60, lr=(1.0, 0.0), lr_mode="cos", lr_ep=(0, 200)),
            dict(start=60, end=120, lr=(1.0, 0.0), lr_mode="cos", lr_ep=(0, 200)),
            dict(start=120, end=200, lr=(1.0, 0.0), lr_mode="cos", lr_ep=(0, 200)),
        ]
    )
    phases = phases_from_stages(stages)
    assert phases == [dict(ep=(0, 200), lr=(1.0, 0.0), mode="cos")]
    spe = 10
    sched = make_lr_schedule(phases, spe, base_epoch=0, base_step=0)
    # halfway through: cos(pi/2) midpoint
    assert np.isclose(float(sched(100 * spe)), 0.5, atol=1e-6)
    # resuming a later stage re-anchored at its base epoch gives the SAME lr
    sched_resumed = make_lr_schedule(phases, spe, base_epoch=120, base_step=120 * spe)
    for step in (120 * spe, 150 * spe, 199 * spe):
        assert np.isclose(float(sched(step)), float(sched_resumed(step)), atol=1e-9)


def test_poly_mode_quadratic():
    from sota_imagenet_tpu.train.schedule import make_lr_schedule

    sched = make_lr_schedule([dict(ep=(0, 100), lr=(1.0, 0.0), mode="poly")], 10, 0, 0)
    for frac in (0.0, 0.25, 0.5, 1.0):
        want = (1.0 - frac) ** 2
        assert np.isclose(float(sched(int(frac * 1000))), want, atol=1e-6)


# --------------------------------------------------------------------------- #
# classes_divisor
# --------------------------------------------------------------------------- #


def test_classes_divisor_merges_labels(mesh8):
    from sota_imagenet_tpu.data.pipeline import DeviceFeed, SyntheticLoader

    host = SyntheticLoader(batch_size=8, image_size=8, num_classes=1000, length=2, seed=3)

    def passthrough(rng, images, labels):
        return images, labels

    feed = DeviceFeed(host, mesh8, passthrough, prefetch=1, label_divisor=10)
    raw = [lab for _, lab in host]
    got = [np.asarray(lab) for _, lab in feed]
    for r, g in zip(raw, got):
        np.testing.assert_array_equal(g, r // 10)
        assert g.max() < 100


def test_classes_divisor_keeps_pad_labels():
    from sota_imagenet_tpu.data.pipeline import DeviceFeed

    # the -1 tail-batch pad label must survive division (stay -1)
    lab = np.asarray([5, -1, 123, -1])
    out = np.where(lab >= 0, lab // 10, lab)
    np.testing.assert_array_equal(out, [0, -1, 12, -1])
    assert DeviceFeed  # imported for parity with the wired path


# --------------------------------------------------------------------------- #
# sigmoid_trick
# --------------------------------------------------------------------------- #


def test_sigmoid_trick_sets_focal_prior_bias():
    import flax

    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.utils.misc import apply_sigmoid_trick

    m = instantiate(dict(_target_="resnet18", num_classes=10))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    newp = apply_sigmoid_trick(p["params"])
    flat = flax.traverse_util.flatten_dict(newp)
    bias = next(v for k, v in flat.items() if k[-2:] == ("fc", "bias"))
    np.testing.assert_allclose(np.asarray(bias), -np.log(9.0), rtol=1e-6)
    # everything else untouched
    old = flax.traverse_util.flatten_dict(p["params"])
    for k, v in flat.items():
        if k[-2:] != ("fc", "bias"):
            np.testing.assert_array_equal(np.asarray(v), np.asarray(old[k]))


def test_sigmoid_trick_fails_loudly_without_fc():
    from sota_imagenet_tpu.utils.misc import apply_sigmoid_trick

    with pytest.raises(ValueError, match="sigmoid_trick"):
        apply_sigmoid_trick({"dense": {"kernel": jnp.zeros((4, 4))}})


# --------------------------------------------------------------------------- #
# BNet sphere_mlp head
# --------------------------------------------------------------------------- #


def _tiny_bnet(**kw):
    from sota_imagenet_tpu.config import instantiate

    return instantiate(
        dict(
            _target_="bnet",
            layers=[1, 1],
            channels=[16, 32],
            block_fns=["XX"] * 2,
            stage_args=[{"dim_reduction": "stride & expand", "bottle_ratio": 1, "final_act": True}] * 2,
            stem_width=16,
            head_type="pool_fc",
            head_width=32,
            num_classes=8,
            **kw,
        )
    )


def test_bnet_sphere_mlp_trains_through_projector():
    """sphere_mlp (exp102 mlp_adacos): train path routes through the MLP
    projector, eval path bypasses it — so train/eval logits differ even with
    frozen stats, and the param tree carries the projector layers."""
    m = _tiny_bnet(sphere_mlp=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    fc = v["params"]["fc"]
    assert set(fc) >= {"weight", "fc1", "fc2", "bn"}
    out_t, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    out_e = m.apply(v, x, train=False)
    assert out_t.shape == out_e.shape == (2, 8)
    # cosine logits in [-1, 1]
    assert float(jnp.abs(out_e).max()) <= 1.0 + 1e-5
    assert not np.allclose(np.asarray(out_t), np.asarray(out_e))


# --------------------------------------------------------------------------- #
# CutmixMixup stop_epoch
# --------------------------------------------------------------------------- #


def test_cutmix_stop_epoch_gates_step_options():
    from sota_imagenet_tpu.train.callbacks import CutmixMixup

    class FakeRunner:
        base_epoch = 0

    cb = CutmixMixup(stop_epoch=180)
    cb.set_runner(FakeRunner())
    assert "mixup_fn" in cb.step_options()
    FakeRunner.base_epoch = 180
    assert cb.step_options() == {}
    cb2 = CutmixMixup()  # no stop: always on
    cb2.set_runner(FakeRunner())
    assert "mixup_fn" in cb2.step_options()


# --------------------------------------------------------------------------- #
# loader interpolation (legacy resize_method) + resnet norm_layer
# --------------------------------------------------------------------------- #


def test_decode_train_interpolation_cubic_differs(tmp_path):
    from PIL import Image

    from sota_imagenet_tpu.data.decode import decode_train

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (96, 128, 3), dtype=np.uint8).astype(np.uint8))
    p = tmp_path / "x.jpg"
    img.save(p, quality=95)
    a = decode_train(str(p), np.random.default_rng(5), 64, interpolation="triangular")
    b = decode_train(str(p), np.random.default_rng(5), 64, interpolation="cubic")
    # same crop (same rng stream), different filter -> different pixels
    assert a.shape == b.shape == (64, 64, 3)
    assert not np.array_equal(a, b)
    # deterministic per (rng, interpolation)
    b2 = decode_train(str(p), np.random.default_rng(5), 64, interpolation="cubic")
    np.testing.assert_array_equal(b, b2)


def test_resnet_agn_norm_layer():
    """legacy `norm_layer: agn` (BResNet50_encoder_agn.yaml): GroupNorm family
    -> no batch_stats collection, still trains/evals."""
    from sota_imagenet_tpu.config import instantiate

    m = instantiate(dict(_target_="resnet18", num_classes=7, norm_layer="agn", norm_act="swish"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    assert "batch_stats" not in v
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(out)))
