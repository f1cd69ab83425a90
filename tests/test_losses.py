import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses import (
    BinaryKLDivLoss,
    CrossEntropyLoss,
    FixMatchLoss,
    FocalLoss,
    HardNegativeWrapper,
)
from sota_imagenet_tpu.losses.base import FnLoss


def test_ce_matches_manual():
    logits = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 2.0, 1.0]])
    labels = jnp.asarray([0, 1])
    loss = CrossEntropyLoss()(logits, labels)
    logp = jax.nn.log_softmax(logits)
    expected = -(logp[0, 0] + logp[1, 1]) / 2
    assert np.isclose(float(loss), float(expected), atol=1e-6)


def test_ce_smoothing():
    logits = jnp.asarray([[2.0, 1.0, 0.0]])
    onehot = jax.nn.one_hot(jnp.asarray([0]), 3)
    s = 0.1
    loss = CrossEntropyLoss(smoothing=s)(logits, onehot)
    logp = jax.nn.log_softmax(logits)
    soft = onehot * (1 - s) + s / 3
    expected = -jnp.sum(soft * logp, axis=-1).mean()
    assert np.isclose(float(loss), float(expected), atol=1e-6)


def test_ce_soft_targets_mixup():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    a = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 10)
    b = jax.nn.one_hot(jnp.asarray([4, 5, 6, 7]), 10)
    mixed = 0.7 * a + 0.3 * b
    loss = CrossEntropyLoss()(logits, mixed)
    la = CrossEntropyLoss()(logits, a)
    lb = CrossEntropyLoss()(logits, b)
    assert np.isclose(float(loss), 0.7 * float(la) + 0.3 * float(lb), atol=1e-5)


def test_loss_arithmetic():
    l1 = CrossEntropyLoss()
    l2 = FnLoss(lambda *a: jnp.asarray(1.0))
    combined = l1 + l2 * 0.5
    logits = jnp.asarray([[5.0, 0.0]])
    labels = jnp.asarray([0])
    assert np.isclose(float(combined(logits, labels)), float(l1(logits, labels)) + 0.5, atol=1e-6)


def test_focal_reduces_easy_examples():
    easy = jnp.asarray([[10.0, 0.0]])
    hard = jnp.asarray([[0.1, 0.0]])
    labels = jnp.asarray([0])
    f = FocalLoss(gamma=2.0)
    ce = CrossEntropyLoss()
    # focal down-weights easy examples much more than hard ones
    ratio_easy = float(f(easy, labels)) / float(ce(easy, labels))
    ratio_hard = float(f(hard, labels)) / float(ce(hard, labels))
    assert ratio_easy < ratio_hard


def test_hard_negative_wrapper():
    base = BinaryKLDivLoss(reduction="none")
    wrapper = HardNegativeWrapper(base, hard_pct=0.5)
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    target = jax.nn.one_hot(jnp.asarray([1, 2, 3, 4]), 10)
    full = float(jnp.mean(base(logits, target)))
    hard = float(wrapper(logits, target))
    assert hard >= full  # top-k mean >= overall mean


def test_fixmatch_runs():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 100))
    labels = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7])
    loss = FixMatchLoss(hard_weight=0.01, hard_pct=0.05)(logits, labels)
    assert np.isfinite(float(loss))
