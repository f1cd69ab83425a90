import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses.angular import (
    AdaCos,
    AdditiveAngularMarginLoss,
    AngularPenaltySMLoss,
    ArcCosSoftmax,
    ArcCosSoftmaxCenter,
    DSoftmax_intra,
    LargeMarginCosineLoss,
    MyLoss1,
    NegativeContrastive,
    SphereCosMAELoss,
    SphereLinearLayer,
    SphereMAELoss,
    SphereMLPLayer,
)
from sota_imagenet_tpu.losses.smooth import CrossEntropyLoss


def _cosines(bs=8, nc=16, seed=0):
    logits = jax.random.normal(jax.random.PRNGKey(seed), (bs, nc))
    cos = logits / jnp.linalg.norm(logits, axis=-1, keepdims=True)
    labels = jnp.arange(bs) % nc
    return cos, labels


def test_sphere_linear_outputs_cosines():
    layer = SphereLinearLayer(num_classes=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    out = layer.apply(layer.init(jax.random.PRNGKey(1), x), x)
    assert out.shape == (4, 16)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5  # cosine range


def test_sphere_mlp_train_vs_eval():
    layer = SphereMLPLayer(num_classes=16, hidden_size=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    variables = layer.init(jax.random.PRNGKey(1), x, train=False)
    out_eval = layer.apply(variables, x, train=False)
    out_train, _ = layer.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out_eval.shape == out_train.shape == (4, 16)
    # projector active only in training -> different outputs
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))


def test_arcface_margin_increases_loss():
    cos, labels = _cosines()
    base = CrossEntropyLoss()
    no_margin = AdditiveAngularMarginLoss(base, s=10.0, m=0.0)(cos, labels)
    with_margin = AdditiveAngularMarginLoss(base, s=10.0, m=0.3)(cos, labels)
    assert float(with_margin) > float(no_margin)  # margin penalizes targets


def test_cosface_margin_increases_loss():
    cos, labels = _cosines()
    lo = LargeMarginCosineLoss(s=10.0, m=0.0)(cos, labels)
    hi = LargeMarginCosineLoss(s=10.0, m=0.4)(cos, labels)
    assert float(hi) > float(lo)


def test_angular_penalty_variants():
    cos, labels = _cosines()
    for lt in ["arcface", "cosface", "sphereface"]:
        loss = AngularPenaltySMLoss(loss_type=lt)(cos, labels)
        assert np.isfinite(float(loss)), lt


def test_adacos_state_threading():
    cos, labels = _cosines()
    crit = AdaCos(momentum=0.5, max_s=20)
    state = crit.init_state()
    losses = []
    for i in range(5):
        loss, state = crit(cos, labels, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # running stats actually moved
    assert float(state["running_cos"]) != 0.7 or float(state["running_B"]) != 1000.0
    assert float(state["prev_s"]) <= 20.0


def test_adacos_onehot_and_int_labels_agree():
    cos, labels = _cosines()
    onehot = jax.nn.one_hot(labels, cos.shape[-1])
    crit = AdaCos()
    l1, _ = crit(cos, labels, crit.init_state())
    l2, _ = crit(cos, onehot, crit.init_state())
    assert np.isclose(float(l1), float(l2), atol=1e-6)


def test_aux_sphere_losses_finite():
    cos, labels = _cosines()
    for loss in [SphereMAELoss(), SphereCosMAELoss(), NegativeContrastive(), DSoftmax_intra(), MyLoss1()]:
        val = loss(cos, labels)
        assert np.isfinite(float(val)), type(loss).__name__


def test_sphere_mae_threshold():
    # all angles below threshold -> zero loss (reference angular_losses.py:435-436)
    nc = 4
    cos = jax.nn.one_hot(jnp.zeros(3, jnp.int32), nc) * 0.9999
    labels = jnp.zeros(3, jnp.int32)
    assert float(SphereMAELoss(threshold=0.2)(cos, labels)) == 0.0


def test_arccos_softmax_variants():
    cos, labels = _cosines()
    assert np.isfinite(float(ArcCosSoftmax()(cos, labels)))
    assert np.isfinite(float(ArcCosSoftmaxCenter(center_weight=0.5)(cos, labels)))
