"""CModel graph-builder tests (mirror the reference's __main__ self-tests,
model.py:1270-1378)."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from sota_imagenet_tpu.models.cmodel import CModel, _update_dict


def _run(model, x_shape=(1, 32, 32, 3), train=False):
    x = jnp.zeros(x_shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


def test_update_dict():
    """Reference test_update_dict (model.py:1126-1144)."""
    assert _update_dict({"a": 10, "b": 20}, {"a": 12, "c": 30}) == {"a": 12, "b": 20, "c": 30}
    assert _update_dict({"foo": {"a": 10, "b": 20}}, {"foo": {"a": 12, "c": 30}}) == {"foo": {"a": 12, "b": 20, "c": 30}}
    assert _update_dict({"bar": 1}, {"foo": {"a": 12, "c": 30}}) == {"bar": 1, "foo": {"a": 12, "c": 30}}


def test_plain_dict_config():
    cfg = yaml.safe_load(
        """
- {module: conv3x3, args: [3, 16]}
- {module: SiLU}
- {module: conv3x3, args: [16, 32], kwargs: {stride: 2}}
- {module: FastGlobalAvgPool2d, kwargs: {flatten: True}}
- {module: Linear, args: [32, 10]}
"""
    )
    out, _ = _run(CModel(layer_config=cfg))
    assert out.shape == (1, 10)


def test_yolo_list_config():
    """The list syntax used by real experiment configs (24.nf_conv-act.yaml)."""
    cfg = yaml.safe_load(
        """
- [-1, 1, ConvActBlock, [3, 16], {stride: 2}]
- [-1, 2, ConvActBlock, [16, 16]]
- [-1, 1, VarEMA]
- [-1, 1, scaled_conv1x1, [16, 64]]
- [-1, 1, 'torch.nn.SiLU']
- [-1, 1, "pt.modules.FastGlobalAvgPool2d", [], {flatten: True}]
- [-1, 1, "torch.nn.Dropout", [0.2]]
- [-1, 1, "nn.Linear", [64, 10]]
"""
    )
    out, variables = _run(CModel(layer_config=cfg), train=True)
    assert out.shape == (1, 10)
    assert "batch_stats" in variables  # VarEMA registered running stats


def test_tagged_skip_connections():
    """U-Net-style reuse of an earlier output (reference model.py:1304-1329)."""
    cfg = yaml.safe_load(
        """
- {module: conv3x3, args: [3, 8], tag: enc}
- {module: conv3x3, args: [8, 8]}
- {module: conv3x3, args: [8, 8]}
- {module: Concat, inputs: [_prev_, enc]}
- {module: conv1x1, args: [16, 8]}
"""
    )
    out, _ = _run(CModel(layer_config=cfg))
    assert out.shape == (1, 32, 32, 8)


def test_extra_kwargs_merge():
    """extra_kwargs defaults merged per class; layer kwargs win
    (reference model.py:1359-1376)."""
    cfg = [
        {"module": "ConvActBlock", "args": [3, 16], "kwargs": {"activation": "relu"}},
        {"module": "ConvActBlock", "args": [16, 16]},
    ]
    extra = {"ConvActBlock": {"activation": "'swish_hard'", "conv_kwargs": {"gamma": 2.0}}}
    model = CModel(layer_config=cfg, extra_kwargs=extra)
    structures = model._build_structures()
    assert structures[0].kwargs["activation"] == "relu"  # layer wins
    assert structures[0].kwargs["conv_kwargs"]["gamma"] == 2.0  # extra merged in
    assert structures[1].kwargs["activation"] == "'swish_hard'"
    out, _ = _run(model)
    assert out.shape == (1, 32, 32, 16)


def test_nf_conv_act_like_model():
    """Miniature of the NFNet-like experiment config (24.nf_conv-act.yaml)."""
    cfg = yaml.safe_load(
        """
- [-1, 1, ConvActBlock, [3, 8], {stride: 2, conv_kwargs: {gain_init: 1.0}}]
- [-1, 1, VarEMA]
- [-1, 2, ConvActBlock, [8, 8]]
- [-1, 1, "pt.modules.BlurPool", 8]
- [-1, 1, NormFreeBlockTimm, [8, 16, 8]]
- [-1, 1, scaled_conv1x1, [16, 32], {gamma: 2.0}]
- [-1, 1, 'torch.nn.SiLU']
- [-1, 1, "pt.modules.FastGlobalAvgPool2d", [], {flatten: True}]
- [-1, 1, "nn.Linear", [32, 10]]
"""
    )
    extra = {
        "ConvActBlock": {"activation": "'swish_hard'"},
        "NormFreeBlockTimm": {"activation": "'swish_hard'", "attention_type": "'eca9'", "keep_prob": 0.85},
        "VarEMA": {"use": False},
    }
    out, _ = _run(CModel(layer_config=cfg, extra_kwargs=extra), train=True)
    assert out.shape == (1, 10)
    assert np.isfinite(np.asarray(out)).all()
