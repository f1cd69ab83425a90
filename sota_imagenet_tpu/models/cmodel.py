"""CModel: build a model graph from a YAML layer list.

Equivalent of the reference's config-model compiler (reference
model.py:1098-1226) with two deliberate changes:

  * module names resolve through an explicit table — never ``eval()``
    (the reference eval's every config string, model.py:1199-1204);
  * both layer syntaxes are accepted: the dict form
    ``{module, args, kwargs, repeat, inputs, tag}`` and the yolo-style list
    form ``[inputs, repeat, module, args?, kwargs?]`` used by the experiment
    configs (e.g. 24.nf_conv-act.yaml).

Reference-config compatibility: names like ``pt.modules.BlurPool``,
``torch.nn.SiLU``, ``nn.Linear`` resolve by their last dotted component;
quoted value strings (``"'swish_hard'"``) are unquoted; known torch class
paths in kwarg values map to our norm/activation names.

Non-linear topologies (U-Net/FPN skips) come from ``tag`` + ``inputs``:
a layer may consume any previously tagged output; multi-input layers (e.g.
``Concat``) receive them positionally (reference custom_forward,
model.py:1219-1226).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models import blocks as B
from sota_imagenet_tpu.models import layers as L
from sota_imagenet_tpu.models import norms as N
from sota_imagenet_tpu.models.attention import UFO, XCA, SEVar3Mod


@dataclass
class ModuleStructure:
    """One layer entry (reference model.py:1098-1107)."""

    module: str
    args: List[Any] = field(default_factory=list)
    kwargs: Dict[str, Any] = field(default_factory=dict)
    repeat: int = 1
    inputs: List[Any] = field(default_factory=lambda: ["_prev_"])
    tag: Optional[str] = None


def _update_dict(to_dict: Dict, from_dict: Dict) -> Dict:
    """dict.update that recurses into nested dicts (reference model.py:1115-1123)."""
    for k, v in from_dict.items():
        if hasattr(v, "keys") and k in to_dict and hasattr(to_dict[k], "keys"):
            _update_dict(to_dict[k], v)
        else:
            to_dict[k] = v
    return to_dict


# --------------------------------------------------------------------------- #
# Module name table (reference-config compatible)
# --------------------------------------------------------------------------- #


def _act(name):
    return lambda *a, **kw: L.Activation(act=name)


def _dropout(p=0.5, **kw):
    kw.pop("inplace", None)
    return L.Dropout(rate=p)


def _conv_residual(*a, **kw):
    """ConvResidual takes an optional leading conv-ctor name in the reference
    (``[ConvResidual, [conv3x3, 48, 64]]``, model.py:1038-1053; used by
    config 68). A plain name selects an unscaled conv."""
    if a and isinstance(a[0], str):
        name, i, o = a[0], a[1], a[2]
        kw.setdefault("scaled", name.startswith("scaled"))
        kw.setdefault("kernel_size", 1 if "1x1" in name else 3)
        return B.ConvResidual(in_chs=i, out_chs=o, **kw)
    return B.ConvResidual(in_chs=a[0], out_chs=a[1], **kw)


def _norm_ctor(cls, chs_field=None):
    def make(*args, **kw):
        if chs_field and args:
            kw.setdefault(chs_field, args[0])
            args = args[1:]
        return cls(**kw)

    return make


_MODULES: Dict[str, Callable[..., nn.Module]] = {
    # blocks
    "ConvActBlock": lambda i, o, **kw: B.ConvActBlock(in_chs=i, out_chs=o, **kw),
    "VGGBlock": lambda i, o, **kw: B.VGGBlock(in_chs=i, out_chs=o, **kw),
    "ConvMixBlock": lambda i, o, **kw: B.ConvMixBlock(in_chs=i, out_chs=o, **kw),
    "NormFreeBlock": lambda i, o, m=None, **kw: B.NormFreeBlock(in_chs=i, out_chs=o, mid_chs=m, **kw),
    "NormFreeBlockTimm": lambda i, o, m=None, **kw: B.NormFreeBlockTimm(in_chs=i, out_chs=o, mid_chs=m, **kw),
    "NonDeepBlock": lambda i, o, **kw: B.NonDeepBlock(in_chs=i, out_chs=o, **kw),
    "EMABlock": lambda i, o, **kw: B.EMABlock(in_chs=i, out_chs=o, **kw),
    "PreInvertedResidual": lambda i, o, m=None, **kw: B.PreInvertedResidual(in_chs=i, out_chs=o, mid_chs=m, **kw),
    "PreBasicBlock": lambda i, o, m=None, **kw: B.PreBasicBlock(in_chs=i, out_chs=o, mid_chs=m, **kw),
    "Yolo5_C3": lambda i, **kw: B.Yolo5_C3(in_chs=i, **kw),
    "ConvMixerBlock": lambda dim, k=9, **kw: B.ConvMixerBlock(dim=dim, kernel_size=k, **kw),
    "ConvBnAct": lambda i, o, **kw: B.ConvBnAct(in_chs=i, out_chs=o, **kw),
    "FusedRepVGGBlock": lambda i, o, **kw: B.FusedRepVGGBlock(in_chs=i, out_chs=o, **kw),
    # convs
    "scaled_conv3x3": L.scaled_conv3x3,
    "scaled_conv1x1": L.scaled_conv1x1,
    "conv3x3": L.conv3x3,
    "conv1x1": L.conv1x1,
    "ScaledStdConv2d": lambda i, o, **kw: L.ScaledStdConv(out_chs=o, **kw),
    # attention
    "XCA_mod": lambda dim, **kw: XCA(dim=dim, **kw),
    "UFO_mod": lambda dim, **kw: UFO(dim=dim, **kw),
    "SEVar3_Mod": lambda i, o, **kw: SEVar3Mod(in_chs=i, out_chs=o, **kw),
    # norms (channel args accepted for parity, inferred from input at runtime)
    "VarEMA": _norm_ctor(N.VarEMA, "n_channels"),
    "FRNv1": _norm_ctor(N.FRNv1, "num_features"),
    "FRNv2": _norm_ctor(N.FRNv2, "num_features"),
    # reference config 64 names a removed "FRN(v3)" class; map to the latest
    # surviving version
    "FRN": _norm_ctor(N.FRNv2, "num_features"),
    "MeanEMA": _norm_ctor(N.MeanEMA),
    "ScaleNorm": _norm_ctor(N.ScaleNorm),
    "Affine": lambda v=1.0, **kw: N.Affine(value=v, **kw),
    "Gain": lambda size, **kw: N.Gain(size=size),
    "BatchNorm2d": _norm_ctor(N.BatchNorm),
    "GroupNorm": lambda num_groups, num_channels=None, **kw: N.GroupNorm(num_groups=num_groups, **kw),
    "ABN": _norm_ctor(N.ABN),
    # layers
    "BlurPool": lambda chs=None, **kw: L.BlurPool(channels=chs, **kw),
    "SpaceToDepth": lambda bs=2, **kw: L.SpaceToDepth(block_size=bs),
    "ChannelShuffle": lambda g=1, **kw: L.ChannelShuffle(groups=g),
    "FastGlobalAvgPool2d": lambda *a, **kw: L.FastGlobalAvgPool(**kw),
    "GEM_pool": lambda *a, **kw: L.GEMPool(**kw),
    "GEM_pool_channel": lambda c=0, **kw: L.GEMPoolChannel(num_channels=c, **kw),
    "ConvResidual": lambda *a, **kw: _conv_residual(*a, **kw),
    "Residual": lambda fn=None, **kw: B.Residual(fn=fn),
    "MaxPool2d": lambda w=3, s=None, p=0, **kw: L.MaxPool(window=w, stride=s if s is not None else w, padding=p),
    "AvgPool2d": lambda w=2, s=None, p=0, **kw: L.AvgPool(window=w, stride=s if s is not None else w, padding=p),
    "Conv2d": lambda i, o, k=3, stride=1, padding=0, bias=True, groups=1, **kw: L.Conv(
        out_chs=o, kernel_size=k, stride=stride, padding=padding, use_bias=bias, groups=groups
    ),
    "Linear": L.linear,
    "Dropout": _dropout,
    "Identity": lambda *a, **kw: N.Identity(),
    "Concat": lambda *a, **kw: L.Concat(**kw),
    "Flatten": lambda *a, **kw: L.Flatten(),
    # sphere heads (reference angular_losses.py:202-245) used as final layers
    "SphereLinearLayer": None,  # patched below (circular import)
    "SphereMLPLayer": None,
    # torch activation class names seen in configs
    "SiLU": _act("silu"),
    "ReLU": _act("relu"),
    "GELU": _act("gelu"),
    "Hardswish": _act("swish_hard"),
    "LeakyReLU": _act("leaky_relu"),
    "Mish": _act("mish"),
    "Sigmoid": _act("sigmoid"),
}

# strings appearing as kwarg *values* in reference configs → our names
_VALUE_ALIASES = {
    "nn.BatchNorm2d": "bn",
    "torch.nn.BatchNorm2d": "bn",
    "nn.Identity": "identity",
    "nn.GroupNorm": "gn",
}


def _patch_sphere_heads():
    if _MODULES.get("SphereLinearLayer") is not None:
        return
    from sota_imagenet_tpu.losses.angular import SphereLinearLayer, SphereMLPLayer

    _MODULES["SphereLinearLayer"] = lambda emb, nc, **kw: SphereLinearLayer(embedding_size=emb, num_classes=nc)
    _MODULES["SphereMLPLayer"] = lambda emb, nc, **kw: SphereMLPLayer(embedding_size=emb, num_classes=nc, **kw)


def resolve_module(name: str) -> Callable[..., nn.Module]:
    _patch_sphere_heads()
    key = name.strip()
    if key in _MODULES:
        return _MODULES[key]
    tail = key.rsplit(".", 1)[-1]
    if tail in _MODULES:
        return _MODULES[tail]
    raise KeyError(f"CModel: unknown module {name!r}; known: {sorted(_MODULES)}")


def _norm_value(v: Any) -> Any:
    """Unquote "'string'" literals and map known torch paths."""
    if isinstance(v, str):
        s = v.strip()
        if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
            return s[1:-1]
        if s in _VALUE_ALIASES:
            return _VALUE_ALIASES[s]
        return s
    if isinstance(v, dict):
        return {k: _norm_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_value(x) for x in v]
    return v


import collections.abc


def _thaw(obj):
    """Recursively convert Mappings (incl. flax FrozenDict) to plain dicts."""
    if isinstance(obj, collections.abc.Mapping):
        return {k: _thaw(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_thaw(v) for v in obj]
    return obj


def _parse_entry(entry: Union[Dict, List]) -> ModuleStructure:
    # flax wraps dict attributes as FrozenDict — accept any Mapping
    if isinstance(entry, collections.abc.Mapping):
        d = _thaw(entry)
        d.setdefault("args", [])
        if not isinstance(d["args"], (list, tuple)):
            d["args"] = [d["args"]]
        d["args"] = list(d["args"])
        return ModuleStructure(**d)
    if isinstance(entry, (list, tuple)):
        # yolo-style: [inputs, repeat, module, args?, kwargs?]
        inputs, repeat, module = entry[0], entry[1], entry[2]
        args = list(entry[3]) if len(entry) > 3 and isinstance(entry[3], (list, tuple)) else (
            [entry[3]] if len(entry) > 3 else []
        )
        kwargs = _thaw(entry[4]) if len(entry) > 4 else {}
        if not isinstance(inputs, (list, tuple)):
            inputs = [inputs]
        inputs = list(inputs)
        inputs = ["_prev_" if i == -1 else i for i in inputs]
        return ModuleStructure(module=module, args=args, kwargs=kwargs, repeat=repeat, inputs=inputs)
    raise ValueError(f"bad CModel layer entry: {entry!r}")


class CModel(nn.Module):
    """Config-defined model (reference CModel, model.py:1147-1226)."""

    layer_config: Sequence[Any] = ()
    extra_kwargs: Optional[Dict[str, Dict]] = None
    dtype: Any = None

    def _build_structures(self) -> List[ModuleStructure]:
        structures = [_parse_entry(e) for e in self.layer_config]
        if self.extra_kwargs:
            for extra_name, extra_kw in _thaw(self.extra_kwargs).items():
                tail = extra_name.rsplit(".", 1)[-1]
                for layer in structures:
                    lt = str(layer.module).rsplit(".", 1)[-1]
                    if str(layer.module) == extra_name or lt == tail:
                        # layer kwargs win over extra_kwargs (reference model.py:1178)
                        layer.kwargs = _update_dict(copy.deepcopy(extra_kw), layer.kwargs)
        return structures

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        structures = self._build_structures()
        tag_to_idx = {s.tag: i for i, s in enumerate(structures) if s.tag is not None}

        def resolve_input(inp, layer_idx: int) -> int:
            """-1/_prev_ = previous output; other ints are yolo-style layer
            references (negative = relative, >=0 = absolute); strings = tags."""
            if inp == "_prev_":
                return -1
            if isinstance(inp, int):
                return layer_idx + inp if inp < 0 else inp
            if inp not in tag_to_idx:
                raise KeyError(f"CModel: input tag {inp!r} not found")
            return tag_to_idx[inp]

        resolved = [[resolve_input(i, idx) for i in s.inputs] for idx, s in enumerate(structures)]
        saved_needed = {j for idxs in resolved for j in idxs if j != -1}

        saved: List[Any] = []
        for idx, s in enumerate(structures):
            ctor = resolve_module(str(s.module))
            args = [_norm_value(a) for a in s.args]
            kwargs = {k: _norm_value(v) for k, v in s.kwargs.items()}
            inps = [x if j == -1 else saved[j] for j in resolved[idx]]
            for r in range(int(s.repeat)):
                # construction inside @nn.compact auto-binds + auto-names
                # (deterministic by layer order, stable for checkpoints)
                mod = ctor(*args, **kwargs)
                x = mod(*inps, train=train)
                inps = [x]
            saved.append(x if idx in saved_needed else None)
        return x
