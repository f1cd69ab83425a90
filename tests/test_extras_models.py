"""Legacy one-off architectures (models/extras.py): geometry and param-count
oracles against the published models they name."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.registry import resolve

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _params(name, num_classes=1000, size=224, **kw):
    m = resolve(name)(num_classes=num_classes, **kw)
    v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, size, size, 3)), train=False), jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    return m, n


def _forward(name, size=64, **kw):
    m = resolve(name)(num_classes=10, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, size, size, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()
    return out


def test_darknet53_param_count():
    # canonical darknet53 classifier: 41.6M params
    _, n = _params("darknet53")
    assert abs(n - 41.6e6) / 41.6e6 < 0.02, n


def test_densenet121_param_count():
    # torchvision densenet121: 7.98M
    _, n = _params("densenet121")
    assert abs(n - 7.98e6) / 7.98e6 < 0.02, n


def test_efficientnet_b0_param_count():
    # published B0: 5.29M
    _, n = _params("efficientnet_b0")
    assert abs(n - 5.29e6) / 5.29e6 < 0.05, n


def test_tresnetm_builds():
    _, n = _params("tresnetm")
    # timm tresnet_m: 31.4M (ours differs in SE placement details; wide tol)
    assert 25e6 < n < 40e6, n


@pytest.mark.parametrize("name,kw", [
    ("darknet53", {}),
    ("cspdarknet53", {}),
    ("densenet121", {}),
    ("efficientnet_b0", {}),
    ("tresnetm", {}),
    ("timm_darknet53", {}),  # legacy aliases resolve
    ("effnetb0_tf", {}),
])
def test_forward_finite(name, kw):
    _forward(name, **kw)


def test_cspdarknet_has_split_stages():
    m = resolve("cspdarknet53")(num_classes=10)
    v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False), jax.random.PRNGKey(0))
    assert "csp_out2" in v["params"]
    # csp halves the residual width vs the plain stage
    plain = resolve("darknet53")(num_classes=10)
    vp = jax.eval_shape(lambda k: plain.init(k, jnp.zeros((1, 64, 64, 3)), train=False), jax.random.PRNGKey(0))
    w_csp = v["params"]["stage2_block0"]["_CBA_1"]["Conv_0"]["Conv_0"]["kernel"].shape[-1]
    w_plain = vp["params"]["stage2_block0"]["_CBA_1"]["Conv_0"]["Conv_0"]["kernel"].shape[-1]
    assert w_csp == w_plain // 2
