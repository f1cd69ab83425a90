"""Residual block zoo (reference model.py:422-1095), NHWC/linen.

The pervasive partial-residual idiom ``out[:, :in_chs] += x`` (reference
model.py:466,928,999) becomes a functional scatter-add
``out.at[..., :c].add(res)`` — XLA fuses it into the producing op.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.attention import SEVar3, UFO, XCA, get_attn
from sota_imagenet_tpu.models.layers import (
    Activation,
    BlurPool,
    ChannelShuffle,
    Conv,
    DropPath,
    ScaledStdConv,
    activation_from_name,
)
from sota_imagenet_tpu.models.norms import Affine, BatchNorm, GroupNorm, Identity, VarEMA, norm_from_name

Dtype = Any


def partial_residual(out: jnp.ndarray, res: jnp.ndarray) -> jnp.ndarray:
    """out[..., :res_chs] += res (supports res_chs <= out_chs)."""
    rc, oc = res.shape[-1], out.shape[-1]
    if rc == oc:
        return out + res
    if rc > oc:
        raise ValueError(f"partial residual needs res chs ({rc}) <= out chs ({oc})")
    return out.at[..., :rc].add(res.astype(out.dtype))


def _groups(in_chs: int, groups: int, groups_width: Optional[int]) -> int:
    return max(in_chs // groups_width, 1) if groups_width else groups


def _make_pre_norm(pre_norm, channels: int) -> Optional[nn.Module]:
    if pre_norm is None or pre_norm is False:
        return None
    if isinstance(pre_norm, nn.Module):
        return pre_norm
    if isinstance(pre_norm, str):
        # reference configs write "VarEMA(128)" (eval'd in the reference,
        # model.py:1199-1204); the channel arg is inferred from the input here
        return norm_from_name(pre_norm.split("(")[0])()
    raise ValueError(f"bad pre_norm {pre_norm!r}")


class ConvActBlock(nn.Module):
    """conv + residual -> act (reference model.py:822-870). Residual is
    BlurPool-downscaled when stride=2; optional XCA after activation."""

    in_chs: int = 0
    out_chs: int = 0
    stride: int = 1
    groups: int = 1
    groups_width: Optional[int] = None
    activation: str = "relu"
    conv_kwargs: Optional[Dict] = None
    attn_kwargs: Optional[Dict] = None
    pre_norm: Optional[str] = None
    sse: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        groups = _groups(self.in_chs, self.groups, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck["groups"] = groups
        x_block = x
        pn = _make_pre_norm(self.pre_norm, self.in_chs)
        if pn is not None:
            x_block = pn(x_block, train=train)
        out = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, stride=self.stride, padding=1, **ck)(x_block)
        out = ChannelShuffle(groups=groups)(out)
        res = BlurPool()(x) if self.stride == 2 else x
        out = partial_residual(out, res)
        out = activation_from_name(self.activation)(out)
        if self.attn_kwargs is not None:
            out = XCA(dim=self.out_chs, **self.attn_kwargs)(out)
        if self.sse and self.in_chs == self.out_chs:
            out = SEVar3(channels=self.out_chs)(out)
        return out


class VGGBlock(nn.Module):
    """pre_norm -> act -> scaled conv3x3 -> shuffle, no residual
    (reference model.py:591-621)."""

    in_chs: int = 0
    out_chs: int = 0
    groups_width: Optional[int] = None
    activation: str = "relu"
    conv_kwargs: Optional[Dict] = None
    pre_norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        groups = _groups(self.in_chs, 1, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck["groups"] = groups
        pn = _make_pre_norm(self.pre_norm, self.in_chs)
        if pn is not None:
            x = pn(x, train=train)
        x = activation_from_name(self.activation)(x)
        x = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, padding=1, **ck)(x)
        return ChannelShuffle(groups=groups)(x)


class ConvMixBlock(nn.Module):
    """act -> pre_norm -> conv -> shuffle -> partial residual with factor
    {0, 0.5, 1} (reference model.py:773-819; its 0.5 branch references an
    undefined attribute — fixed here)."""

    in_chs: int = 0
    out_chs: int = 0
    groups_width: Optional[int] = None
    activation: str = "relu"
    partial_factor: float = 1.0
    conv_kwargs: Optional[Dict] = None
    pre_norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if self.partial_factor not in (0, 0.5, 1, 1.0):
            raise ValueError("partial_factor must be one of {0, 0.5, 1}")
        groups = _groups(self.in_chs, 1, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck["groups"] = groups
        out = activation_from_name(self.activation)(x)
        pn = _make_pre_norm(self.pre_norm, self.in_chs)
        if pn is not None:
            out = pn(out, train=train)
        out = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, padding=1, **ck)(out)
        out = ChannelShuffle(groups=groups)(out)
        n_common = min(self.in_chs, self.out_chs)
        if self.partial_factor == 1:
            out = out.at[..., :n_common].add(x[..., :n_common].astype(out.dtype))
        elif self.partial_factor == 0.5:
            rc = int(n_common * 0.5)
            out = out.at[..., :rc].add(x[..., :rc].astype(out.dtype))
        return out


class NormFreeBlock(nn.Module):
    """Pre-act 2-conv basic block with alpha/beta gain inits
    (reference model.py:874-930; NFNet arXiv:2102.06171)."""

    in_chs: int = 0
    out_chs: int = 0
    mid_chs: Optional[int] = None
    groups: int = 1
    groups_width: Optional[int] = None
    activation: str = "relu"
    attention_type: Optional[str] = None
    attention_kwargs: Optional[Dict] = None
    attention_gain: float = 2.0
    keep_prob: float = 1.0
    beta: float = 1.0
    alpha: float = 0.2
    conv_kwargs: Optional[Dict] = None
    pre_norm_group_width: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        mid = self.mid_chs or self.out_chs
        groups = _groups(self.in_chs, self.groups, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        out = x
        if self.pre_norm_group_width is not None:
            out = GroupNorm(num_groups=self.in_chs // self.pre_norm_group_width)(out)
        act = activation_from_name(self.activation)
        out = act(out)
        out = ScaledStdConv(out_chs=mid, kernel_size=3, padding=1, gain_init=self.beta, groups=groups, **ck)(out)
        out = ChannelShuffle(groups=groups)(out)
        out = act(out)
        out = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, padding=1, gain_init=self.alpha, groups=groups, **ck)(out)
        out = ChannelShuffle(groups=groups)(out)
        if self.attention_type:
            attn = get_attn(self.attention_type)(self.out_chs, **(self.attention_kwargs or {}))
            out = Affine(value=self.attention_gain)(attn(out, train=train))
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return partial_residual(out, x)


class NormFreeBlockTimm(nn.Module):
    """1-3-3-1 pre-act bottleneck, timm-NFNet style (reference model.py:933-1001).
    ``regnet_attention`` moves attention inside the bottleneck; ``full_conv``
    switches the 3x3s to reflect padding."""

    in_chs: int = 0
    out_chs: int = 0
    mid_chs: Optional[int] = None
    groups: int = 1
    groups_width: Optional[int] = None
    activation: str = "relu"
    attention_type: Optional[str] = None
    attention_kwargs: Optional[Dict] = None
    attention_gain: float = 2.0
    keep_prob: float = 1.0
    conv_kwargs: Optional[Dict] = None
    beta: float = 1.0
    alpha: float = 0.2
    regnet_attention: bool = False
    pre_norm_group_width: Optional[int] = None
    full_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        mid = self.mid_chs or self.out_chs
        groups = _groups(mid, self.groups, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck.pop("padding_mode", None)  # reflect handled below
        act = activation_from_name(self.activation)

        def conv3(chs, name, **kw):
            return ScaledStdConv(out_chs=chs, kernel_size=3, padding=1, groups=groups, name=name, **ck, **kw)

        out = x
        if self.pre_norm_group_width is not None:
            out = GroupNorm(num_groups=self.in_chs // self.pre_norm_group_width)(out)
        out = act(out)
        out = ScaledStdConv(out_chs=mid, kernel_size=1, padding=0, gain_init=self.beta, name="conv1", **ck)(out)
        out = act(out)
        if self.full_conv:
            out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = ScaledStdConv(out_chs=mid, kernel_size=3, padding=0, groups=groups, name="conv2", **ck)(out)
        else:
            out = conv3(mid, "conv2")(out)
        out = act(out)
        if self.full_conv:
            out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = ScaledStdConv(out_chs=mid, kernel_size=3, padding=0, groups=groups, name="conv2b", **ck)(out)
        else:
            out = conv3(mid, "conv2b")(out)

        def apply_attn(t):
            attn = get_attn(self.attention_type)(t.shape[-1], **(self.attention_kwargs or {}))
            return Affine(value=self.attention_gain)(attn(t, train=train))

        if self.attention_type and self.regnet_attention:
            out = apply_attn(out)
        out = act(out)
        out = ScaledStdConv(out_chs=self.out_chs, kernel_size=1, padding=0, gain_init=self.alpha, name="conv3", **ck)(out)
        if self.attention_type and not self.regnet_attention:
            out = apply_attn(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return partial_residual(out, x)


class NonDeepBlock(nn.Module):
    """ParNet-style block: norm -> conv1x1 + conv3x3 + SE/XCA/UFO, optional
    residual, shuffle, hardswish (reference model.py:658-726)."""

    in_chs: int = 0
    out_chs: int = 0
    groups_width: Optional[int] = None
    conv_kwargs: Optional[Dict] = None
    scaled: bool = False
    norm: str = "bn"
    shuffle: bool = True
    residual: bool = False
    use_conv3: bool = True
    xca_kwargs: Optional[Dict] = None
    ufo_kwargs: Optional[Dict] = None
    se_kwargs: Optional[Dict] = None
    use_se: bool = True  # reference default se_kwargs=dict() → SE on

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if self.residual and self.in_chs > self.out_chs:
            raise ValueError("dimension reduction unsupported with residual=True")
        groups = _groups(self.in_chs, 1, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck["groups"] = groups
        x_norm = norm_from_name(self.norm)()(x, train=train)
        conv1_cls = ScaledStdConv if self.scaled else Conv
        out = conv1_cls(out_chs=self.out_chs, kernel_size=1, padding=0, name="c1", **{k: v for k, v in ck.items() if k != "groups"} , groups=groups)(x_norm)
        if self.use_conv3:
            out = out + conv1_cls(out_chs=self.out_chs, kernel_size=3, padding=1, name="c3", **ck)(x_norm)
        if self.xca_kwargs is not None:
            if self.in_chs != self.out_chs:
                raise ValueError("XCA requires in_chs == out_chs")
            xk = dict(self.xca_kwargs)
            xk.setdefault("residual", False)  # summed into the block output anyway
            out = out + XCA(dim=self.out_chs, **xk)(x_norm, train=train)
        elif self.ufo_kwargs is not None:
            uk = dict(self.ufo_kwargs)
            if self.in_chs != self.out_chs:
                uk["last_proj"] = True  # projection required to reach out_chs
            uk.setdefault("residual", False)  # summed into the block output anyway
            out = out + UFO(dim=self.in_chs, out_dim=self.out_chs, **uk)(x_norm, train=train)
        elif self.use_se and self.in_chs == self.out_chs:
            out = out + SEVar3(channels=self.out_chs, scaled=self.scaled)(x_norm)
        if self.residual:
            out = partial_residual(out, x)
        if self.shuffle:
            out = ChannelShuffle(groups=groups)(out)
        return jax.nn.hard_silu(out)


class EMABlock(nn.Module):
    """VarEMA-normalized residual conv block (reference model.py:422-468)."""

    in_chs: int = 0
    out_chs: int = 0
    groups: int = 1
    groups_width: Optional[int] = None
    activation: str = "relu"
    conv_kwargs: Optional[Dict] = None
    keep_prob: float = 1.0
    remove_ema: bool = False
    conv_act: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        groups = _groups(self.in_chs, self.groups, self.groups_width)
        ck = dict(self.conv_kwargs or {})
        ck["groups"] = groups
        res = x if self.remove_ema else VarEMA()(x, train=train)
        act = activation_from_name(self.activation)
        out = res
        if self.conv_act:
            out = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, padding=1, **ck)(out)
            out = ChannelShuffle(groups=groups)(out)
            out = act(out)
        else:
            out = act(out)
            out = ScaledStdConv(out_chs=self.out_chs, kernel_size=3, padding=1, **ck)(out)
            out = ChannelShuffle(groups=groups)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return partial_residual(out, res)


class PreInvertedResidual(nn.Module):
    """Pre-norm inverted residual: bn-act, 1x1, bn-act, dw3x3, bn-act, 1x1
    (reference model.py:1004-1035)."""

    in_chs: int = 0
    out_chs: int = 0
    mid_chs: Optional[int] = None
    keep_prob: float = 1.0
    norm_layer: str = "abn"
    norm_act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        mid = self.mid_chs or self.out_chs
        norm = norm_from_name(self.norm_layer)
        out = norm(activation=self.norm_act)(x, train=train)
        out = Conv(out_chs=mid, kernel_size=1, padding=0, use_bias=False)(out)
        out = norm(activation=self.norm_act)(out, train=train)
        out = Conv(out_chs=mid, kernel_size=3, padding=1, groups=mid, use_bias=False)(out)
        out = norm(activation=self.norm_act)(out, train=train)
        out = Conv(out_chs=self.out_chs, kernel_size=1, padding=0, use_bias=False)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return partial_residual(out, x)


class PreBasicBlock(nn.Module):
    """Pre-activation basic block with activated norms and partial residual
    (pytorch_tools PreBasicBlock, used by the reference BNet configs,
    e.g. 6.bnet_no_dim_red.yaml): norm-act, 3x3, norm-act, 3x3, drop-path,
    += x."""

    in_chs: int = 0
    out_chs: int = 0
    mid_chs: Optional[int] = None
    keep_prob: float = 1.0
    norm_layer: str = "abn"
    norm_act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        mid = self.mid_chs or self.out_chs
        norm = norm_from_name(self.norm_layer)
        out = norm(activation=self.norm_act)(x, train=train)
        out = Conv(out_chs=mid, kernel_size=3, padding=1, use_bias=False)(out)
        out = norm(activation=self.norm_act)(out, train=train)
        out = Conv(out_chs=self.out_chs, kernel_size=3, padding=1, use_bias=False)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return partial_residual(out, x)


class Yolo5_C3(nn.Module):
    """CSP bottleneck with NonDeepBlocks (reference model.py:728-754)."""

    in_chs: int = 0
    num_blocks: int = 1
    pre_norm: bool = False
    block_kwargs: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        c = self.in_chs
        bk = dict(self.block_kwargs or dict(use_se=False))
        if "se_kwargs" in bk:  # reference spelling: se_kwargs=None disables SE
            bk["use_se"] = bk.pop("se_kwargs") is not None

        def cv(name):
            def apply(t):
                if self.pre_norm:
                    t = BatchNorm(name=f"{name}_bn")(t, train=train)
                    t = ScaledStdConv(out_chs=c, kernel_size=1, padding=0, name=f"{name}_conv")(t)
                    return jax.nn.hard_silu(t)
                t = ScaledStdConv(out_chs=c, kernel_size=1, padding=0, name=f"{name}_conv")(t)
                t = BatchNorm(name=f"{name}_bn")(t, train=train)
                return jax.nn.hard_silu(t)

            return apply

        t = cv("cv1_2")(x)
        block_inp, res = jnp.split(t, 2, axis=-1)
        for i in range(self.num_blocks):
            block_inp = NonDeepBlock(in_chs=c // 2, out_chs=c // 2, name=f"m{i}", **bk)(block_inp, train=train)
        return cv("cv3")(jnp.concatenate([block_inp, res], axis=-1))


class FusedRepVGGBlock(nn.Module):
    """RepVGG block (arXiv:2101.03697; pytorch_tools FusedRepVGGBlock used by
    the reference's BNet CModel configs, model.py:1232-1247): parallel
    3x3-BN + 1x1-BN + (identity-BN when shapes match), summed, then act.
    At inference the three branches are algebraically one 3x3 conv — XLA
    constant-folds the BN scales, so no explicit re-parameterization pass is
    needed on TPU."""

    in_chs: int = 0
    out_chs: int = 0
    stride: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        out = Conv(out_chs=self.out_chs, kernel_size=3, stride=self.stride, padding=1, use_bias=False, name="conv3")(x)
        out = BatchNorm(name="bn3")(out, train=train)
        out1 = Conv(out_chs=self.out_chs, kernel_size=1, stride=self.stride, padding=0, use_bias=False, name="conv1")(x)
        out = out + BatchNorm(name="bn1")(out1, train=train)
        if self.in_chs == self.out_chs and self.stride == 1:
            out = out + BatchNorm(name="bn_id")(x, train=train)
        return activation_from_name(self.activation)(out)


class ConvBnAct(nn.Module):
    """conv3x3 + BN + activation — convenience for VGG-style CModel configs
    (the reference writes the three layers out each time, 62.vgg-cmodel.yaml)."""

    in_chs: int = 0
    out_chs: int = 0
    activation: str = "swish_hard"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        x = Conv(out_chs=self.out_chs, kernel_size=3, stride=self.stride, padding=1, use_bias=False)(x)
        x = BatchNorm()(x, train=train)
        return activation_from_name(self.activation)(x)


class ConvResidual(nn.Module):
    """A single conv with a (partial) residual around it
    (reference ConvResidual, model.py:1038-1053)."""

    in_chs: int = 0
    out_chs: int = 0
    kernel_size: int = 3
    stride: int = 1
    scaled: bool = True
    conv_kwargs: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if self.in_chs > self.out_chs:
            raise ValueError("in_chs > out_chs unsupported (reference model.py:1052)")
        ck = dict(self.conv_kwargs or {})
        conv_cls = ScaledStdConv if self.scaled else Conv
        pad = self.kernel_size // 2
        out = conv_cls(out_chs=self.out_chs, kernel_size=self.kernel_size, stride=self.stride, padding=pad, **ck)(x)
        return partial_residual(out, x)


class Residual(nn.Module):
    """fn(x) + x (reference model.py:1066-1072)."""

    fn: Callable = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        out = self.fn(x, train=train) if isinstance(self.fn, nn.Module) else self.fn(x)
        return out + x


class ConvMixerBlock(nn.Module):
    """ConvMixer block: residual dw-conv + gelu + bn, then 1x1 + gelu + bn
    (reference model.py:1075-1089)."""

    dim: int = 0
    kernel_size: int = 9

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        k = self.kernel_size
        out = Conv(out_chs=self.dim, kernel_size=k, padding=3, groups=self.dim, use_bias=True)(x)
        out = jax.nn.gelu(out)
        out = BatchNorm()(out, train=train)
        # torch padding=3 with k=9 shrinks the map; crop residual to match
        if out.shape[1] != x.shape[1]:
            dh, dw = x.shape[1] - out.shape[1], x.shape[2] - out.shape[2]
            res = x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2), :]
        else:
            res = x
        out = out + res
        out = Conv(out_chs=self.dim, kernel_size=1, padding=0, use_bias=True)(out)
        out = jax.nn.gelu(out)
        return BatchNorm()(out, train=train)
