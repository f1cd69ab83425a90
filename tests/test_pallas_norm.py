"""Pallas per-channel moments kernel (ops/pallas_norm.py): exactness + VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.ops.pallas_norm import moments
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

INTERPRET = jax.default_backend() != "tpu"


def test_moments_match_jnp():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 7, 64)) * 2 + 1
    mean, var = moments(x, INTERPRET)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.mean(x, axis=(0, 1, 2))), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(jnp.var(x, axis=(0, 1, 2))), atol=1e-4)


def test_moments_vjp_matches_jnp():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 6, 128))

    def f_pallas(x):
        m, v = moments(x, INTERPRET)
        return jnp.sum(m * 2.0 + v * 3.0)

    def f_ref(x):
        return jnp.sum(jnp.mean(x, axis=(0, 1, 2)) * 2.0 + jnp.var(x, axis=(0, 1, 2)) * 3.0)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pallas)(x)), np.asarray(jax.grad(f_ref)(x)), atol=1e-5
    )


def test_moments_bf16_and_ragged_rows():
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 9, 5, 128), jnp.bfloat16)  # N=135, not tile-aligned
    mean, var = moments(x, INTERPRET)
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.mean(xf, axis=(0, 1, 2))), atol=1e-2)
    np.testing.assert_allclose(np.asarray(var), np.asarray(jnp.var(xf, axis=(0, 1, 2))), atol=1e-2)
