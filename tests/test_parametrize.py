import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.models.parametrize import (
    ParametrizedModel,
    backward_weight_norm,
    normalize_conv_weight,
    spectral_normalize,
    weight_standardization_fn,
    zero_mean_conv_weight,
)


def test_zero_mean():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) + 2.0
    out = zero_mean_conv_weight(w)
    np.testing.assert_allclose(np.asarray(jnp.mean(out, axis=(0, 1, 2))), 0.0, atol=1e-6)


def test_normalize_conv_weight_scale():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * 5 + 1
    gamma = 2.0
    out = normalize_conv_weight(w, gamma)
    fan_in = 3 * 3 * 4
    std = np.std(np.asarray(out), axis=(0, 1, 2))
    np.testing.assert_allclose(std, gamma / np.sqrt(fan_in), rtol=1e-3)


def test_spectral_normalize():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * 3
    out = spectral_normalize(w, n_iters=20)
    mat = np.asarray(out).reshape(-1, 8)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-2


def test_backward_weight_norm_unit_rows():
    params = {"conv": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * 4}}
    out = backward_weight_norm(params)
    mat = np.asarray(out["conv"]["kernel"]).reshape(-1, 8)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=0), 1.0, rtol=1e-5)
    np.testing.assert_allclose(mat.mean(axis=0), 0.0, atol=1e-6)
    # small weights (< 64 elems) untouched
    small = {"conv": {"kernel": jnp.ones((1, 1, 2, 2))}}
    out2 = backward_weight_norm(small)
    np.testing.assert_array_equal(np.asarray(out2["conv"]["kernel"]), np.ones((1, 1, 2, 2)))


def test_parametrized_model_changes_forward():
    from sota_imagenet_tpu.models.cmodel import CModel

    model = CModel(layer_config=[{"module": "conv3x3", "args": [3, 8]}])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    wrapped = ParametrizedModel(model, weight_standardization_fn(1.72))
    y_plain = model.apply(variables, x)
    y_ws = wrapped.apply(variables, x)
    assert y_plain.shape == y_ws.shape
    assert not np.allclose(np.asarray(y_plain), np.asarray(y_ws))
    # gradients flow through the parametrization
    def loss(params):
        return jnp.sum(wrapped.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(max(jnp.max(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))) > 0
