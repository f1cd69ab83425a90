"""Fused 1x1-conv + BN-stats kernel: forward values, stats exactness vs the
XLA formulation, and custom-VJP gradients vs an unfused jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.ops.pallas_conv_stats import conv1x1_stats, conv1x1_stats_nhwc

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

ON_TPU = jax.default_backend() == "tpu"
INTERP = not ON_TPU


def _oracle(x2d, w):
    y = jnp.dot(x2d.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )
    y32 = y.astype(jnp.float32)
    return y, jnp.sum(y32, axis=0), jnp.sum(y32 * y32, axis=0)


@pytest.mark.parametrize("m,k,n", [(256, 64, 256), (384, 128, 512), (100, 32, 128)])
def test_forward_matches_oracle(m, k, n):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.1
    y, s1, s2 = conv1x1_stats(x, w, INTERP)
    ye, s1e, s2e = _oracle(x, w)
    np.testing.assert_array_equal(np.asarray(y, np.float32), np.asarray(ye, np.float32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1e), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2e), rtol=1e-5, atol=1e-3)


def test_grads_match_unfused():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    m, k, n = 256, 64, 128
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.1

    def loss_fused(x, w):
        y, s1, s2 = conv1x1_stats(x, w, INTERP)
        mean = s1 / m
        var = s2 / m - mean**2
        return jnp.sum(y.astype(jnp.float32) * 0.01) + jnp.sum(mean * 0.5) + jnp.sum(var * 0.25)

    def loss_ref(x, w):
        y, s1, s2 = _oracle(x, w)
        mean = s1 / m
        var = s2 / m - mean**2
        return jnp.sum(y.astype(jnp.float32) * 0.01) + jnp.sum(mean * 0.5) + jnp.sum(var * 0.25)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gxr, gwr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gwr), rtol=2e-2, atol=2e-2)


def test_nhwc_strided():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (2, 8, 8, 32), jnp.float32)
    w = jax.random.normal(kw, (1, 1, 32, 128), jnp.float32) * 0.1
    y, s1, s2 = conv1x1_stats_nhwc(x, w, stride=2, interpret=INTERP)
    assert y.shape == (2, 4, 4, 128)
    # strided 1x1 conv == subsample + matmul == lax.conv with stride
    ye = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ye, np.float32), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(s1), np.sum(np.asarray(ye, np.float32), (0, 1, 2)), rtol=1e-4, atol=1e-2)


def test_conv1x1bnstats_matches_conv_plus_bn():
    """Conv1x1BNStats == Conv + flax BatchNorm given the same kernel, in both
    train and eval mode (values + running-stat updates)."""
    from flax import linen as nn
    from sota_imagenet_tpu.models.resnet import Conv1x1BNStats

    kx = jax.random.PRNGKey(3)
    x = jax.random.normal(kx, (4, 8, 8, 32), jnp.float32)
    fused = Conv1x1BNStats(out_chs=64, momentum=0.1, activation="relu", dtype=jnp.float32)
    v = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            y = nn.Conv(64, (1, 1), use_bias=False, name="conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn")(y)
            return jax.nn.relu(y)

    ref = Ref()
    rv = ref.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    rv = jax.tree_util.tree_map(lambda t: t, rv)
    rv["params"]["conv"]["kernel"] = v["params"]["kernel"]
    rv["params"]["bn"]["scale"] = v["params"]["scale"]
    rv["params"]["bn"]["bias"] = v["params"]["bias"]

    if ON_TPU:
        # train mode runs the pallas kernel only on TPU; interpret is exercised
        # through conv1x1_stats tests above
        ytr, mut = fused.apply(v, x, train=True, mutable=["batch_stats"])
        yref, mref = ref.apply(rv, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ytr), np.asarray(yref), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]), np.asarray(mref["batch_stats"]["bn"]["mean"]), rtol=1e-2, atol=1e-3
        )
    # eval path (plain XLA conv) everywhere
    yev = fused.apply(v, x, train=False)
    yrefev = ref.apply(rv, x, train=False)
    np.testing.assert_allclose(np.asarray(yev), np.asarray(yrefev), rtol=1e-4, atol=1e-4)
