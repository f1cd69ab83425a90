"""ResNet family, NHWC/bfloat16, torchvision-compatible semantics.

Replaces the reference's external model zoo surface (`pytorch_tools.models.
resnet50/resnet18`, reference arg_parser.py:126 and 21+ configs) including the
"BResNet" variant options recorded in
configs/_old_configs/_first_attempts/BResNet50_encoder.yaml:42-52:
space2depth/deep stem, antialias (BlurPool), ECA attention, activated-BN with
leaky_relu, drop-path and dropout.

TPU notes: stride-2 convs and the 7x7 stem lower straight onto the MXU via
XLA's NHWC conv path; BN+ReLU fuse; drop-path uses functional RNG.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.attention import get_attn
from sota_imagenet_tpu.models.layers import (
    BlurPool,
    Conv,
    DropPath,
    Dropout,
    SpaceToDepth,
    activation_from_name,
    max_pool,
)
from sota_imagenet_tpu.models.norms import BatchNorm, GroupNorm

Dtype = Any

# norm families: "batch" = the default BN/ABN path (unchanged layout, torch
# parity), "group" = GroupNorm (legacy ``norm_layer: agn``/``gn``,
# _old_configs/_first_attempts/BResNet50_encoder_agn.yaml:13)
_GN_FAMILY = ("agn", "gn", "groupnorm")


def _bare_norm(norm_layer: str, chs: int, momentum: float, subsample: int, dtype, name=None):
    """Norm WITHOUT activation (pre-residual / downsample positions)."""
    if norm_layer in _GN_FAMILY:
        import math

        return GroupNorm(num_groups=math.gcd(32, chs), dtype=dtype, name=name)
    return BatchNorm(momentum=momentum, subsample=subsample, dtype=dtype, name=name)


class Conv1x1BNStats(nn.Module):
    """1x1 conv + BatchNorm with the batch statistics computed in the conv's
    Pallas matmul epilogue (ops/pallas_conv_stats.py) — removes the separate
    HBM read of the conv output that XLA's BN stats reduction performs
    (profiling: BN-stats convert+reduce = 47% of the r50 step). Eval mode is a
    plain XLA conv + running-stats normalize. Optional fused activation.

    Parameter/stat names mirror Conv (kernel) + flax BatchNorm (scale, bias /
    mean, var) one level down, so state dicts stay readable."""

    out_chs: int = 0
    stride: int = 1
    momentum: float = 0.1  # torch convention
    eps: float = 1e-5
    activation: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (1, 1, c_in, self.out_chs),
            jnp.float32,
        )
        c = self.out_chs
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        dt = self.dtype or x.dtype

        if not train or self.is_initializing():
            y = jax.lax.conv_general_dilated(
                x.astype(dt),
                kernel.astype(dt),
                (self.stride, self.stride),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            mean, var = ra_mean.value, ra_var.value
        else:
            from sota_imagenet_tpu.ops.pallas_conv_stats import conv1x1_stats_nhwc

            y, s1, s2 = conv1x1_stats_nhwc(x, kernel, stride=self.stride)
            n = y.shape[0] * y.shape[1] * y.shape[2]
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * var
        inv = (jax.lax.rsqrt(var + self.eps) * scale).astype(dt)
        out = y.astype(dt) * inv + (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(dt)
        if self.activation:
            out = activation_from_name(self.activation)(out)
        return out


class _NormAct(nn.Module):
    """Norm + activation (ABN-style); `activation='identity'` for plain norm.
    ``norm_layer`` selects the family — the default keeps the BN path (torch
    parity), the GN family serves the legacy ``agn`` configs."""

    activation: str = "relu"
    momentum: float = 0.1  # torch convention (cfg.bn_momentum; reference train.py:76)
    subsample: int = 1  # spatial subsampling of BN stats (profile-driven, ROADMAP.md)
    norm_layer: str = "abn"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bare_norm(self.norm_layer, x.shape[-1], self.momentum, self.subsample, self.dtype)(x, train=train)
        return activation_from_name(self.activation)(x)


class BasicBlock(nn.Module):
    planes: int = 64
    bn_momentum: float = 0.1
    bn_subsample: int = 1
    stride: int = 1
    downsample: bool = False
    norm_act: str = "relu"
    norm_layer: str = "abn"
    antialias: bool = False
    attn_type: Optional[str] = None
    keep_prob: float = 1.0
    dtype: Dtype = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p, dt = self.planes, self.dtype
        conv_stride = 1 if self.antialias else self.stride
        out = Conv(out_chs=p, kernel_size=3, stride=conv_stride, padding=1, use_bias=False, dtype=dt)(x)
        if self.antialias and self.stride == 2:
            out = BlurPool()(out)
        out = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt)(out, train=train)
        out = Conv(out_chs=p, kernel_size=3, padding=1, use_bias=False, dtype=dt)(out)
        out = _bare_norm(self.norm_layer, p, self.bn_momentum, self.bn_subsample, dt)(out, train=train)
        if self.attn_type:
            out = get_attn(self.attn_type)(p)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        res = x
        if self.downsample:
            if self.antialias and self.stride == 2:
                res = BlurPool()(res)
                res = Conv(out_chs=p, kernel_size=1, padding=0, use_bias=False, dtype=dt, name="down_conv")(res)
            else:
                res = Conv(out_chs=p, kernel_size=1, stride=self.stride, padding=0, use_bias=False, dtype=dt, name="down_conv")(res)
            res = _bare_norm(self.norm_layer, p, self.bn_momentum, self.bn_subsample, dt, name="down_bn")(res, train=train)
        return activation_from_name(self.norm_act)(out + res)


class Bottleneck(nn.Module):
    planes: int = 64
    bn_momentum: float = 0.1
    bn_subsample: int = 1
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm_act: str = "relu"
    norm_layer: str = "abn"
    antialias: bool = False
    attn_type: Optional[str] = None
    keep_prob: float = 1.0
    fused_stats: bool = False  # pallas conv1x1+BN-stats epilogue (TPU perf)
    dtype: Dtype = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_chs = self.planes * self.expansion
        if self.fused_stats and self.bn_subsample > 1:
            # Conv1x1BNStats computes full-resolution stats; combining it with
            # stats subsampling would silently give a hybrid neither flag
            # promises
            raise ValueError("fused_stats is incompatible with bn_subsample > 1")
        if self.fused_stats and self.groups == 1:
            out = Conv1x1BNStats(
                out_chs=width, momentum=self.bn_momentum, activation=self.norm_act, dtype=dt, name="fconv1"
            )(x, train=train)
        else:
            out = Conv(out_chs=width, kernel_size=1, padding=0, use_bias=False, dtype=dt)(x)
            out = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt)(out, train=train)
        conv_stride = 1 if self.antialias else self.stride
        out = Conv(out_chs=width, kernel_size=3, stride=conv_stride, padding=1, groups=self.groups, use_bias=False, dtype=dt)(out)
        if self.antialias and self.stride == 2:
            out = BlurPool()(out)
        out = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt)(out, train=train)
        if self.fused_stats:
            out = Conv1x1BNStats(out_chs=out_chs, momentum=self.bn_momentum, dtype=dt, name="fconv3")(out, train=train)
        else:
            out = Conv(out_chs=out_chs, kernel_size=1, padding=0, use_bias=False, dtype=dt)(out)
            out = _bare_norm(self.norm_layer, out_chs, self.bn_momentum, self.bn_subsample, dt)(out, train=train)
        if self.attn_type:
            out = get_attn(self.attn_type)(out_chs)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        res = x
        if self.downsample:
            if self.antialias and self.stride == 2:
                res = BlurPool()(res)
                res = Conv(out_chs=out_chs, kernel_size=1, padding=0, use_bias=False, dtype=dt, name="down_conv")(res)
                res = _bare_norm(self.norm_layer, out_chs, self.bn_momentum, self.bn_subsample, dt, name="down_bn")(res, train=train)
            elif self.fused_stats:
                res = Conv1x1BNStats(
                    out_chs=out_chs, stride=self.stride, momentum=self.bn_momentum, dtype=dt, name="fdown"
                )(res, train=train)
            else:
                res = Conv(out_chs=out_chs, kernel_size=1, stride=self.stride, padding=0, use_bias=False, dtype=dt, name="down_conv")(res)
                res = _bare_norm(self.norm_layer, out_chs, self.bn_momentum, self.bn_subsample, dt, name="down_bn")(res, train=train)
        return activation_from_name(self.norm_act)(out + res)


class ResNet(nn.Module):
    """Configurable ResNet (torchvision layout + BResNet options)."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    groups: int = 1
    base_width: int = 64
    stem_type: str = ""  # "" | "deep" | "space2depth"
    bn_momentum: float = 0.1  # reference patch_bn_mom (train.py:76)
    bn_subsample: int = 1  # >1: subsample BN stats spatially (TPU perf, ROADMAP.md)
    norm_act: str = "relu"
    # norm family: "abn"/"bn"/"inplaceabn" = BatchNorm (default; inplace-abn's
    # memory trick is moot under XLA fusion), "agn"/"gn" = GroupNorm (legacy
    # BResNet50_encoder_agn.yaml / resnet50_group_norm.yaml)
    norm_layer: str = "abn"
    antialias: bool = False
    attn_type: Optional[str] = None
    drop_rate: float = 0.0
    drop_connect_rate: float = 0.0
    fused_stats: bool = False  # pallas conv1x1+BN-stats epilogue (TPU perf)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        # --- stem ---
        if self.stem_type == "space2depth":
            x = SpaceToDepth(block_size=4)(x)  # 3 -> 48 chs, /4 spatial
            x = Conv(out_chs=64, kernel_size=3, padding=1, use_bias=False, dtype=dt, name="stem_conv")(x)
            x = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt, name="stem_bn")(x, train=train)
        elif self.stem_type == "deep":
            for i, chs in enumerate((32, 32, 64)):
                x = Conv(out_chs=chs, kernel_size=3, stride=2 if i == 0 else 1, padding=1, use_bias=False, dtype=dt, name=f"stem_conv{i}")(x)
                x = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt, name=f"stem_bn{i}")(x, train=train)
            x = max_pool(x, 3, 2, 1)
        else:
            x = Conv(out_chs=64, kernel_size=7, stride=2, padding=3, use_bias=False, dtype=dt, name="stem_conv")(x)
            x = _NormAct(activation=self.norm_act, momentum=self.bn_momentum, subsample=self.bn_subsample, norm_layer=self.norm_layer, dtype=dt, name="stem_bn")(x, train=train)
            x = max_pool(x, 3, 2, 1)

        # --- stages ---
        total_blocks = sum(self.layers)
        block_idx = 0
        in_chs = 64
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = stride != 1 or in_chs != planes * self.block.expansion
                # linearly-increasing drop-path (timm convention)
                keep_prob = 1.0 - self.drop_connect_rate * block_idx / max(total_blocks - 1, 1)
                x = self.block(
                    planes=planes,
                    bn_momentum=self.bn_momentum,
                    bn_subsample=self.bn_subsample,
                    stride=stride,
                    downsample=downsample,
                    norm_act=self.norm_act,
                    norm_layer=self.norm_layer,
                    antialias=self.antialias,
                    attn_type=self.attn_type,
                    keep_prob=keep_prob if self.drop_connect_rate > 0 else 1.0,
                    dtype=dt,
                    name=f"layer{stage + 1}_{b}",
                    **(
                        {"groups": self.groups, "base_width": self.base_width, "fused_stats": self.fused_stats}
                        if self.block is Bottleneck
                        else {}
                    ),
                )(x, train=train)
                in_chs = planes * self.block.expansion
                block_idx += 1

        # --- head ---
        x = jnp.mean(x, axis=(1, 2))
        x = Dropout(rate=self.drop_rate)(x, train=train)
        x = nn.Dense(
            self.num_classes,
            dtype=dt,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            name="fc",
        )(x)
        return x.astype(jnp.float32)


def _resnet(block, layers, **kwargs):
    kwargs.pop("pretrained", None)  # no hub on TPU pods; checkpoints via orbax
    if kwargs.pop("deep_stem", False):  # legacy flat-schema alias (resnet34_1phase.yaml)
        kwargs.setdefault("stem_type", "deep")
    kwargs["norm_layer"] = str(kwargs.get("norm_layer", "abn")).lower()
    return ResNet(block=block, layers=tuple(layers), **kwargs)


def resnet18(**kwargs):
    """torchvision-arch ResNet-18 (reference default model, arg_parser.py:126)."""
    return _resnet(BasicBlock, (2, 2, 2, 2), **kwargs)


def resnet34(**kwargs):
    return _resnet(BasicBlock, (3, 4, 6, 3), **kwargs)


def resnet50(**kwargs):
    """torchvision-arch ResNet-50 — the 77.1% baseline (reference README.md:42,
    configs/hydra_exp/1.r50_baseline.yaml)."""
    return _resnet(Bottleneck, (3, 4, 6, 3), **kwargs)


def resnet101(**kwargs):
    return _resnet(Bottleneck, (3, 4, 23, 3), **kwargs)


def bresnet50(**kwargs):
    """BResNet-50: the 81.4% "ultimate encoder" recipe's architecture
    (BResNet50_encoder.yaml:42-52): s2d stem + BlurPool + ECA + leaky ABN +
    drop-path/dropout."""
    defaults = dict(
        stem_type="space2depth",
        antialias=True,
        attn_type="eca",
        norm_act="leaky_relu",
        drop_rate=0.2,
        drop_connect_rate=0.2,
    )
    defaults.update(kwargs)
    return _resnet(Bottleneck, (3, 4, 6, 3), **defaults)
