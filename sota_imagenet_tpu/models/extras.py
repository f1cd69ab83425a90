"""Legacy one-off architectures referenced by configs/_old_configs
(_first_attempts: densenet121_baseline.yaml, effnetb0.yaml, effnetb0_tf.yaml,
tresnetm.yaml, darknet53_baseline.yaml; _exp1-85: exp4/exp5 timm_darknet53 /
timm_cspdarknet53). In the reference these resolved to external
pytorch-tools / timm model zoos (SURVEY.md §2.2); here they are compact NHWC
flax builders with the canonical published geometries.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.attention import SE
from sota_imagenet_tpu.models.layers import (
    Conv,
    DropPath,
    Dropout,
    SpaceToDepth,
    activation_from_name,
    max_pool,
)
from sota_imagenet_tpu.models.norms import BatchNorm
from sota_imagenet_tpu.models.resnet import BasicBlock, Bottleneck

Dtype = Any


class _CBA(nn.Module):
    """conv + BN + act."""

    out_chs: int = 0
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    activation: str = "leaky_relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            out_chs=self.out_chs,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.kernel_size // 2,
            groups=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train=train)
        return activation_from_name(self.activation)(x)


class _DarkResidual(nn.Module):
    chs: int = 64
    activation: str = "leaky_relu"
    keep_prob: float = 1.0  # stochastic depth (darknet drop_connect_rate)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _CBA(out_chs=self.chs // 2, kernel_size=1, activation=self.activation, dtype=self.dtype)(x, train=train)
        out = _CBA(out_chs=self.chs, kernel_size=3, activation=self.activation, dtype=self.dtype)(out, train=train)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        return x + out


class Darknet53(nn.Module):
    """Darknet-53 (YOLOv3 backbone, arXiv:1804.02767): stem conv(32), five
    stride-2 transition convs to (64..1024) each followed by (1,2,8,8,4)
    residual [1x1 c/2 -> 3x3 c] blocks; LeakyReLU. ``csp=True`` wraps each
    stage CSP-style (CSPDarknet-53, arXiv:1911.11929) — the legacy
    ``timm_cspdarknet53``."""

    layers: Sequence[int] = (1, 2, 8, 8, 4)
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    csp: bool = False
    num_classes: int = 1000
    drop_rate: float = 0.0
    # stochastic depth on the residual blocks, linearly decayed keep_prob
    # (legacy darknet53_baseline.yaml `drop_connect_rate: 0.3`)
    drop_connect_rate: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        total = max(sum(self.layers) - 1, 1)
        idx = 0

        def _kp(i):
            return 1.0 - self.drop_connect_rate * i / total if self.drop_connect_rate else 1.0

        x = _CBA(out_chs=32, kernel_size=3, dtype=dt, name="stem")(x, train=train)
        for s, (n, c) in enumerate(zip(self.layers, self.channels)):
            x = _CBA(out_chs=c, kernel_size=3, stride=2, dtype=dt, name=f"down{s}")(x, train=train)
            if self.csp and n > 1:
                half = c // 2
                blk = _CBA(out_chs=half, kernel_size=1, dtype=dt, name=f"csp_in{s}")(x, train=train)
                bypass = _CBA(out_chs=half, kernel_size=1, dtype=dt, name=f"csp_by{s}")(x, train=train)
                for i in range(n):
                    blk = _DarkResidual(chs=half, keep_prob=_kp(idx), dtype=dt, name=f"stage{s}_block{i}")(blk, train=train)
                    idx += 1
                blk = _CBA(out_chs=half, kernel_size=1, dtype=dt, name=f"csp_t{s}")(blk, train=train)
                x = jnp.concatenate([blk, bypass], axis=-1)
                x = _CBA(out_chs=c, kernel_size=1, dtype=dt, name=f"csp_out{s}")(x, train=train)
            else:
                for i in range(n):
                    x = _DarkResidual(chs=c, keep_prob=_kp(idx), dtype=dt, name=f"stage{s}_block{i}")(x, train=train)
                    idx += 1
        x = jnp.mean(x, axis=(1, 2))
        x = Dropout(rate=self.drop_rate)(x, train=train)
        x = nn.Dense(self.num_classes, dtype=dt or x.dtype, param_dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)


class DenseNet121(nn.Module):
    """DenseNet-121 (arXiv:1608.06993): growth 32, blocks (6,12,24,16),
    BN-ReLU-1x1(4k) -> BN-ReLU-3x3(k) concat; 1x1-half + avgpool transitions.
    Legacy ``arch: densenet121`` (densenet121_baseline.yaml)."""

    growth: int = 32
    blocks: Sequence[int] = (6, 12, 24, 16)
    num_classes: int = 1000
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        k = self.growth
        x = Conv(out_chs=2 * k, kernel_size=7, stride=2, padding=3, use_bias=False, dtype=dt, name="stem_conv")(x)
        x = BatchNorm(dtype=dt, name="stem_bn")(x, train=train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        for b, n in enumerate(self.blocks):
            for i in range(n):
                y = BatchNorm(dtype=dt, name=f"b{b}_{i}_bn1")(x, train=train)
                y = nn.relu(y)
                y = Conv(out_chs=4 * k, kernel_size=1, padding=0, use_bias=False, dtype=dt, name=f"b{b}_{i}_conv1")(y)
                y = BatchNorm(dtype=dt, name=f"b{b}_{i}_bn2")(y, train=train)
                y = nn.relu(y)
                y = Conv(out_chs=k, kernel_size=3, padding=1, use_bias=False, dtype=dt, name=f"b{b}_{i}_conv2")(y)
                x = jnp.concatenate([x, y], axis=-1)
            if b < len(self.blocks) - 1:
                x = BatchNorm(dtype=dt, name=f"t{b}_bn")(x, train=train)
                x = nn.relu(x)
                x = Conv(out_chs=x.shape[-1] // 2, kernel_size=1, padding=0, use_bias=False, dtype=dt, name=f"t{b}_conv")(x)
                x = nn.avg_pool(x, (2, 2), (2, 2))
        x = BatchNorm(dtype=dt, name="final_bn")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=dt or x.dtype, param_dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)


class _MBConv(nn.Module):
    out_chs: int = 16
    expand: int = 6
    kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    keep_prob: float = 1.0
    activation: str = "swish"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_chs = x.shape[-1]
        mid = in_chs * self.expand
        out = x
        if self.expand != 1:
            out = _CBA(out_chs=mid, kernel_size=1, activation=self.activation, dtype=dt, name="expand")(out, train=train)
        out = Conv(
            out_chs=mid, kernel_size=self.kernel_size, stride=self.stride,
            padding=self.kernel_size // 2, groups=mid, use_bias=False, dtype=dt, name="dw",
        )(out)
        out = BatchNorm(dtype=dt, name="dw_bn")(out, train=train)
        out = activation_from_name(self.activation)(out)
        if self.se_ratio:
            # EfficientNet SE reduces from the block INPUT width
            out = SE(channels=mid, reduction=int(1 / (self.se_ratio / self.expand)), name="se")(out)
        out = Conv(out_chs=self.out_chs, kernel_size=1, padding=0, use_bias=False, dtype=dt, name="project")(out)
        out = BatchNorm(dtype=dt, name="project_bn")(out, train=train)
        if self.stride == 1 and in_chs == self.out_chs:
            out = DropPath(keep_prob=self.keep_prob)(out, train=train)
            out = out + x
        return out


class EfficientNetB0(nn.Module):
    """EfficientNet-B0 (arXiv:1905.11946): MBConv stages
    (e,c,n,s,k) = (1,16,1,1,3),(6,24,2,2,3),(6,40,2,2,5),(6,80,3,2,3),
    (6,112,3,1,5),(6,192,4,2,5),(6,320,1,1,3); swish, SE .25, head 1280.
    Legacy ``arch: efficientnet_b0`` (effnetb0.yaml; effnetb0_tf.yaml is the
    TF-ported weights variant — identical architecture here)."""

    num_classes: int = 1000
    drop_rate: float = 0.2
    drop_connect_rate: float = 0.2
    norm_act: str = "swish"  # legacy effnetb0.yaml sets it explicitly
    dtype: Dtype = None

    STAGES = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
              (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3))

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        x = _CBA(out_chs=32, kernel_size=3, stride=2, activation=self.norm_act, dtype=dt, name="stem")(x, train=train)
        total = sum(n for _, _, n, _, _ in self.STAGES)
        idx = 0
        for s, (e, c, n, stride, k) in enumerate(self.STAGES):
            for i in range(n):
                kp = 1.0 - self.drop_connect_rate * idx / max(total - 1, 1)
                x = _MBConv(
                    out_chs=c, expand=e, kernel_size=k, stride=stride if i == 0 else 1,
                    keep_prob=kp if self.drop_connect_rate else 1.0, activation=self.norm_act,
                    dtype=dt, name=f"s{s}_b{i}",
                )(x, train=train)
                idx += 1
        x = _CBA(out_chs=1280, kernel_size=1, activation=self.norm_act, dtype=dt, name="head")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = Dropout(rate=self.drop_rate)(x, train=train)
        x = nn.Dense(self.num_classes, dtype=dt or x.dtype, param_dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)


class TResNetM(nn.Module):
    """TResNet-M (arXiv:2003.13630): SpaceToDepth stem -> conv1x1(64);
    BasicBlock(64)x3, BasicBlock(128)x4 + SE, Bottleneck(p256)x11 + SE,
    Bottleneck(p512)x3; leaky_relu, anti-aliased stride-2.
    Legacy ``arch: tresnetm`` (tresnetm.yaml)."""

    num_classes: int = 1000
    drop_rate: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        x = SpaceToDepth(block_size=4)(x)
        x = Conv(out_chs=64, kernel_size=1, padding=0, use_bias=False, dtype=dt, name="stem_conv")(x)
        x = BatchNorm(dtype=dt, name="stem_bn")(x, train=train)
        x = activation_from_name("leaky_relu")(x)
        plan = (
            (BasicBlock, 64, 3, 1, "se"),
            (BasicBlock, 128, 4, 2, "se"),
            (Bottleneck, 256, 11, 2, "se"),
            (Bottleneck, 512, 3, 2, None),
        )
        in_chs = 64
        for s, (block, planes, n, stride, attn) in enumerate(plan):
            for i in range(n):
                st = stride if i == 0 else 1
                down = st != 1 or in_chs != planes * block.expansion
                x = block(
                    planes=planes, stride=st, downsample=down, norm_act="leaky_relu",
                    antialias=True, attn_type=attn, dtype=dt, name=f"layer{s + 1}_{i}",
                )(x, train=train)
                in_chs = planes * block.expansion
        x = jnp.mean(x, axis=(1, 2))
        x = Dropout(rate=self.drop_rate)(x, train=train)
        x = nn.Dense(self.num_classes, dtype=dt or x.dtype, param_dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)


def _strip(kwargs):
    kwargs.pop("pretrained", None)
    return kwargs


def darknet53(**kwargs) -> Darknet53:
    return Darknet53(**_strip(kwargs))


def cspdarknet53(**kwargs) -> Darknet53:
    return Darknet53(csp=True, **_strip(kwargs))


def densenet121(**kwargs) -> DenseNet121:
    # torch-only gradient-checkpointing flag (densenet121_baseline.yaml);
    # rematerialization is jax.checkpoint / XLA-side here
    kwargs.pop("memory_efficient", None)
    return DenseNet121(**_strip(kwargs))


def efficientnet_b0(**kwargs) -> EfficientNetB0:
    return EfficientNetB0(**_strip(kwargs))


def tresnetm(**kwargs) -> TResNetM:
    return TResNetM(**_strip(kwargs))
