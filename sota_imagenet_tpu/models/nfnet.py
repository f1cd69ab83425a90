"""Normalizer-free networks (NFNet-L / ECA-NFNet family).

The reference trains ``timm.models.eca_nfnet_l0`` (configs/hydra_exp/
15.eca_nfnet_l0.yaml, 78.3-80.4% top-1). This is a TPU-native equivalent of
that architecture family (Brock et al., arXiv:2101.08692 + arXiv:2102.06171):
scaled-WS convs, pre-activation bottlenecks with alpha/beta signal-propagation
scaling, ECA attention with gain 2.0, skip-init gains, stochastic depth —
built on this package's ScaledStdConv/blocks rather than a timm port.

Signal-propagation bookkeeping follows the NFNet recipe: each block's input is
downscaled by beta = 1/expected_std; expected_std resets at stage transitions
and grows by sqrt(1 + alpha^2) per block.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.attention import get_attn
from sota_imagenet_tpu.models.layers import (
    ACTIVATION_GAMMA,
    DropPath,
    Dropout,
    ScaledStdConv,
    activation_from_name,
)

Dtype = Any


def _make_divisible(v: int, divisor: int = 8) -> int:
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


class NFBlock(nn.Module):
    """Pre-act normalizer-free bottleneck (1-3-3-1) with alpha/beta scaling."""

    out_chs: int
    stride: int = 1
    beta: float = 1.0
    alpha: float = 0.2
    bottle_ratio: float = 0.25
    group_size: int = 64
    attn_type: Optional[str] = "eca"
    attn_gain: float = 2.0
    keep_prob: float = 1.0
    gamma: float = ACTIVATION_GAMMA["silu"]
    activation: str = "silu"
    skipinit: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # gamma is folded into the ACTIVATION (act_g = gamma*act), matching
        # timm/DeepMind NFNets exactly — all WS convs use gamma=1.0, so a timm
        # state_dict imports without any rescaling (utils/torch_import.py)
        base_act = activation_from_name(self.activation)
        act = lambda t: base_act(t) * self.gamma
        mid = int(self.out_chs * self.bottle_ratio)
        groups = max(mid // self.group_size, 1)
        mid = groups * self.group_size

        out = act(x) * self.beta

        shortcut = x
        if self.stride > 1 or x.shape[-1] != self.out_chs:
            s = out
            if self.stride > 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = ScaledStdConv(out_chs=self.out_chs, kernel_size=1, padding=0, gamma=1.0, name="downsample")(s)

        out = ScaledStdConv(out_chs=mid, kernel_size=1, padding=0, gamma=1.0, name="conv1")(out)
        out = act(out)
        out = ScaledStdConv(out_chs=mid, kernel_size=3, stride=self.stride, padding=1, groups=groups, gamma=1.0, name="conv2")(out)
        out = act(out)
        out = ScaledStdConv(out_chs=mid, kernel_size=3, padding=1, groups=groups, gamma=1.0, name="conv2b")(out)
        out = act(out)
        out = ScaledStdConv(out_chs=self.out_chs, kernel_size=1, padding=0, gamma=1.0, name="conv3")(out)
        if self.attn_type:
            # gain 2.0 compensates the sigmoid gate's mean of ~0.5 (NFNet recipe)
            out = self.attn_gain * get_attn(self.attn_type)(self.out_chs)(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)
        if self.skipinit:
            gain = self.param("skipinit_gain", nn.initializers.zeros, (), jnp.float32)
            out = out * gain.astype(out.dtype)
        return out * self.alpha + shortcut


class NFNet(nn.Module):
    """Normalizer-free network with deep-quad stem (NFNet-L layout)."""

    depths: Sequence[int] = (1, 2, 6, 3)
    channels: Sequence[int] = (256, 512, 1536, 1536)
    stem_chs: Sequence[int] = (16, 32, 64, 128)
    group_size: int = 64
    bottle_ratio: float = 0.25
    alpha: float = 0.2
    num_classes: int = 1000
    final_mult: float = 1.5  # final 1x1 conv: channels[-1] * mult (l0: 2304)
    attn_type: Optional[str] = "eca"
    activation: str = "silu"
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    skipinit: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        gamma = ACTIVATION_GAMMA.get(self.activation, 1.7)
        base_act = activation_from_name(self.activation)
        act = lambda t: base_act(t) * gamma  # gamma-folded act (timm convention)

        # deep-quad stem: /4 spatial
        strides = (2, 1, 1, 2)
        for i, (chs, st) in enumerate(zip(self.stem_chs, strides)):
            x = ScaledStdConv(out_chs=chs, kernel_size=3, stride=st, padding=1, gamma=1.0, name=f"stem_conv{i}")(x)
            if i < len(self.stem_chs) - 1:
                x = act(x)

        total_blocks = sum(self.depths)
        block_idx = 0
        expected_std = 1.0
        for stage, (depth, chs) in enumerate(zip(self.depths, self.channels)):
            for b in range(depth):
                stride = 2 if (b == 0 and stage > 0) else 1
                beta = 1.0 / expected_std
                keep_prob = 1.0 - self.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                x = NFBlock(
                    out_chs=chs,
                    stride=stride,
                    beta=beta,
                    alpha=self.alpha,
                    bottle_ratio=self.bottle_ratio,
                    group_size=self.group_size,
                    attn_type=self.attn_type,
                    keep_prob=keep_prob if self.drop_path_rate > 0 else 1.0,
                    gamma=gamma,
                    activation=self.activation,
                    skipinit=self.skipinit,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train=train)
                if b == 0:
                    expected_std = 1.0  # transition resets variance tracking
                expected_std = (expected_std**2 + self.alpha**2) ** 0.5
                block_idx += 1

        final_chs = int(self.channels[-1] * self.final_mult)
        x = ScaledStdConv(out_chs=final_chs, kernel_size=1, padding=0, gamma=1.0, name="final_conv")(x)
        x = act(x)
        x = jnp.mean(x, axis=(1, 2))
        x = Dropout(rate=self.drop_rate)(x, train=train)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype or x.dtype,  # follow activation dtype (see layers.Linear)
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            name="fc",
        )(x)
        return x.astype(jnp.float32)


def eca_nfnet_l0(drop_rate: float = 0.0, drop_path_rate: float = 0.0, **kwargs):
    """ECA-NFNet-L0 equivalent (reference trains timm's, 15.eca_nfnet_l0.yaml)."""
    kwargs.pop("pretrained", None)
    return NFNet(
        depths=(1, 2, 6, 3),
        channels=(256, 512, 1536, 1536),
        attn_type="eca",
        drop_rate=drop_rate,
        drop_path_rate=drop_path_rate,
        **kwargs,
    )


def eca_nfnet_l1(drop_rate: float = 0.0, drop_path_rate: float = 0.0, **kwargs):
    kwargs.pop("pretrained", None)
    return NFNet(
        depths=(2, 4, 12, 6),
        channels=(256, 512, 1536, 1536),
        attn_type="eca",
        drop_rate=drop_rate,
        drop_path_rate=drop_path_rate,
        **kwargs,
    )
