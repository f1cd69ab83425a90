"""bf16 activation-dtype policy: every registry module must PRESERVE the
activation dtype (params stay fp32).

Why this matters: flax leaves with ``dtype=None`` promote bf16 activations
with fp32 params to fp32 compute — one such layer drags the entire downstream
graph to fp32, silently halving MXU rate and doubling HBM traffic for every
config-built model (found benching vgg16_bn: 698 img/s where ~bf16-rate was
expected). The reference's AMP autocast semantics are the spec: conv/linear
in half precision, normalization stats accumulated in fp32, outputs in the
activation dtype.
"""

import jax
import jax.numpy as jnp
import pytest

from sota_imagenet_tpu.models.cmodel import CModel, _MODULES

# args per registry module for a (2, 8, 8, 3) input feature map
ARGS = {
    "ConvActBlock": [3, 8],
    "NormFreeBlock": [3, 8],
    "NormFreeBlockTimm": [3, 8],
    "NonDeepBlock": [3, 3],
    "EMABlock": [3, 3],
    "VGGBlock": [3, 8],
    "ConvMixBlock": [3, 8],
    "ConvMixerBlock": [3],
    "ConvResidual": [3, 8],
    "ConvBnAct": [3, 8],
    "PreInvertedResidual": [3, 3],
    "PreBasicBlock": [3, 3],
    "FusedRepVGGBlock": [3, 8],
    "scaled_conv3x3": [3, 8],
    "scaled_conv1x1": [3, 8],
    "conv3x3": [3, 8],
    "conv1x1": [3, 8],
    "ScaledStdConv2d": [3, 8],
    "Conv2d": [3, 8, 3],
    "SEVar3_Mod": [3, 3],
    "BatchNorm2d": [3],
    "ABN": [3],
    "GroupNorm": [1, 3],
    "FRN": [3],
    "FRNv1": [3],
    "FRNv2": [3],
    "VarEMA": [3],
    "ScaleNorm": [3],
    "MeanEMA": [3],
    "Gain": [3],
    "Affine": [3],
    "ChannelShuffle": [1],
    "SpaceToDepth": [],
    "BlurPool": [],
    "MaxPool2d": [2, 2],
    "AvgPool2d": [2, 2],
    "GEM_pool": [],
    "GEM_pool_channel": [],
    "FastGlobalAvgPool2d": [],
    "Flatten": [],
    "Identity": [],
    "Dropout": [0.5],
    "ReLU": [],
    "SiLU": [],
    "GELU": [],
    "Mish": [],
    "Hardswish": [],
    "Sigmoid": [],
    "LeakyReLU": [],
}
# need >= 8 channels (head counts / even splits): prepend a conv1x1 to 16
WIDE = {"XCA_mod": [16], "UFO_mod": [16], "Yolo5_C3": [16]}
# operate on flattened (B, D) features: prepend a GAP
FLAT = {"Linear": [3, 8], "SphereLinearLayer": [3, 8], "SphereMLPLayer": [3, 8]}
# sphere heads emit fp32 COSINE logits on purpose — the fp32 loss-island
# convention (reference clamps/normalizes angular losses in fp32,
# angular_losses.py:81,328; utils.py:69)
ALLOWED_FP32 = {"SphereLinearLayer", "SphereMLPLayer"}
SKIP = {
    "Concat",  # multi-input; covered by tagged-graph tests
    "Residual",  # wraps a submodule INSTANCE (fn=...); not YAML-constructible alone
}


@pytest.mark.parametrize("name", sorted(ARGS) + sorted(WIDE) + sorted(FLAT))
def test_module_preserves_bf16(name):
    if name in FLAT:
        cfg = [
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": name, "args": FLAT[name]},
        ]
    elif name in WIDE:
        cfg = [{"module": "conv1x1", "args": [3, 16]}, {"module": name, "args": WIDE[name]}]
    else:
        cfg = [{"module": name, "args": ARGS[name]}]
    model = CModel(layer_config=cfg, dtype=jnp.bfloat16)
    x = jnp.ones((2, 8, 8, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    want = jnp.float32 if name in ALLOWED_FP32 else jnp.bfloat16
    for train in (False, True):
        y = model.apply(
            variables, x, train=train, mutable=["batch_stats"] if "batch_stats" in variables else False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        y = y[0] if isinstance(y, tuple) else y
        assert y.dtype == want, f"{name} (train={train}) output {y.dtype}, want {want}"
    # params must stay fp32 (mixed precision: fp32 master weights)
    for leaf in jax.tree_util.tree_leaves(variables.get("params", {})):
        assert leaf.dtype == jnp.float32


def test_cli_instantiated_models_run_bf16():
    """Models built WITHOUT an explicit dtype= (exactly how train.py
    instantiates them from configs) must still compute in bf16 when fed bf16
    activations — the regression that had CLI runs silently training at fp32
    rate. Checks the intermediate-activation dtype histogram."""
    from sota_imagenet_tpu.models import resnet18

    m = resnet18()
    x = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    _, st = m.apply(v, x, train=False, capture_intermediates=True, mutable=["intermediates"])
    leaves = [l for l in jax.tree_util.tree_leaves(st["intermediates"]) if hasattr(l, "dtype")]
    n_bf16 = sum(l.dtype == jnp.bfloat16 for l in leaves)
    # everything except the fp32 head (GAP + logits island) is bf16
    assert n_bf16 >= len(leaves) - 2, f"{n_bf16}/{len(leaves)} intermediates bf16"


def test_registry_fully_covered():
    """Every registered module is either probed here or consciously skipped."""
    known = set(ARGS) | set(WIDE) | set(FLAT) | SKIP
    missing = {n for n in _MODULES if n not in known}
    assert not missing, f"modules without a dtype-policy probe: {sorted(missing)}"
