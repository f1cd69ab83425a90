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


def test_ws_skips_depthwise():
    """Reference ForwardWeightNorm only parametrizes groups==1 convs
    (callbacks.py:75-78); depthwise flax kernels have shape[2] == 1."""
    params = {
        "dw": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (3, 3, 1, 8)) + 2.0},
        "conv": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8)) + 2.0},
    }
    out = weight_standardization_fn(None)(params)
    np.testing.assert_array_equal(np.asarray(out["dw"]["kernel"]), np.asarray(params["dw"]["kernel"]))
    np.testing.assert_allclose(np.asarray(jnp.mean(out["conv"]["kernel"], axis=(0, 1, 2))), 0.0, atol=1e-6)


def test_spectral_stateful_sigma_and_state():
    from sota_imagenet_tpu.models.parametrize import SpectralNormParametrization

    params = {"conv": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * 3}}
    sp = SpectralNormParametrization(n_iters=1)
    st = sp.init_state(params)
    out, st2 = sp(params, st, update=True)
    mat = np.asarray(out["conv"]["kernel"]).reshape(-1, 8)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-2  # 15 warm-start iterations converge
    # eval (update=False) leaves u/v untouched
    _, st3 = sp(params, st2, update=False)
    np.testing.assert_array_equal(np.asarray(st3["conv/kernel"]["u"]), np.asarray(st2["conv/kernel"]["u"]))
    # training forward with CHANGED weights moves u toward the new operator
    params2 = {"conv": {"kernel": jax.random.normal(jax.random.PRNGKey(9), (3, 3, 4, 8)) * 3}}
    _, st4 = sp(params2, st2, update=True)
    assert not np.allclose(np.asarray(st4["conv/kernel"]["u"]), np.asarray(st2["conv/kernel"]["u"]))
    # gradient flows through w only (u/v constant): grad is finite & nonzero
    g = jax.grad(lambda p: jnp.sum(sp(p, st2, True)[0]["conv"]["kernel"] ** 2))(params)
    gmax = float(jnp.max(jnp.abs(g["conv"]["kernel"])))
    assert np.isfinite(gmax) and gmax > 0


def test_spectral_state_threads_through_wrapped_apply():
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.models.parametrize import SPECTRAL_STATE_KEY, SpectralNormParametrization

    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8]},
            {"module": "BatchNorm2d", "args": [8]},
        ]
    )
    wrapped = ParametrizedModel(model, SpectralNormParametrization())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = wrapped.init(jax.random.PRNGKey(1), x, train=False)
    assert SPECTRAL_STATE_KEY in variables["batch_stats"]
    u0 = np.asarray(next(iter(variables["batch_stats"][SPECTRAL_STATE_KEY].values()))["u"])
    # train forward: BN stats update AND spectral u/v update ride mutable
    y, updated = wrapped.apply(variables, x, train=True, mutable=["batch_stats"])
    assert SPECTRAL_STATE_KEY in updated["batch_stats"]
    u1 = np.asarray(next(iter(updated["batch_stats"][SPECTRAL_STATE_KEY].values()))["u"])
    assert not np.allclose(u0, u1)  # power iteration advanced
    # the inner BN stats also updated (coexistence with real batch_stats)
    assert any(k != SPECTRAL_STATE_KEY for k in updated["batch_stats"])
    # eval forward works without mutable
    y2 = wrapped.apply(variables, x, train=False)
    assert y2.shape == y.shape


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
