"""Primitive layers (NHWC, TPU-first).

Equivalents of the reference's building blocks — ScaledStdConv2d (reference
model.py:31-152), ChannelShuffle (model.py:178-192), ScaleNorm/Affine/Gain
(model.py:212-253) — plus the pytorch_tools modules referenced by configs
(BlurPool, SpaceToDepth, FastGlobalAvgPool2d, DropConnect; SURVEY.md §2.2).

All modules use NHWC layout (channels last — the native TPU conv layout) and
accept an optional ``dtype`` for bfloat16 compute with float32 params. Weight
statistics (weight standardization, norms) are always computed in float32.
"""

from __future__ import annotations

import math
from functools import partial as _partial
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# --------------------------------------------------------------------------- #
# Activations (pytorch_tools.modules.activation_from_name equivalent)
# --------------------------------------------------------------------------- #

_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "elu": jax.nn.elu,
    "identity": lambda x: x,
    "none": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "swish_hard": jax.nn.hard_silu,
    "hard_swish": jax.nn.hard_silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": jax.nn.gelu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
}

# Signal-propagation gains: E[f(x)^2]^-0.5 for x~N(0,1). Matches the NFNet
# convention the reference relies on via `gamma` (model.py:59, arg_parser.py:133).
ACTIVATION_GAMMA: dict = {
    "relu": math.sqrt(2.0 / (1.0 - 1.0 / math.pi)),  # ≈1.7139
    "silu": 1.7881293296813965,  # timm _nonlin_gamma value, for exact import parity
    "swish": 1.7881293296813965,
    "swish_hard": 1.8138,
    "gelu": 1.7015,
    "identity": 1.0,
}


def activation_from_name(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    key = name.strip().strip("'\"").lower()
    if key not in _ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[key]


class Activation(nn.Module):
    """Activation as a module so it can appear in CModel layer configs.
    (field is ``act`` — ``name`` is reserved by flax Module)"""

    act: str = "relu"

    @nn.compact
    def __call__(self, x, **_):
        return activation_from_name(self.act)(x)


# --------------------------------------------------------------------------- #
# Shape utilities
# --------------------------------------------------------------------------- #


class SpaceToDepth(nn.Module):
    """(B, H, W, C) → (B, H/s, W/s, C*s²). pytorch_tools SpaceToDepth equivalent
    (used by BResNet s2d stem, SURVEY.md §2.2)."""

    block_size: int = 2

    @nn.compact
    def __call__(self, x, **_):
        s = self.block_size
        b, h, w, c = x.shape
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // s, w // s, c * s * s)


class ChannelShuffle(nn.Module):
    """Mix channels after grouped conv (reference model.py:178-192).
    NHWC: (..., groups, C/groups) → transpose → flatten."""

    groups: int = 1

    @nn.compact
    def __call__(self, x, **_):
        if self.groups == 1:
            return x
        *lead, c = x.shape
        x = x.reshape(*lead, self.groups, c // self.groups)
        x = jnp.swapaxes(x, -1, -2)
        return x.reshape(*lead, c)


class Concat(nn.Module):
    """Concatenate multiple inputs along channels (reference model.py:1110-1112)."""

    axis: int = -1

    @nn.compact
    def __call__(self, *xs, **_):
        return jnp.concatenate(xs, axis=self.axis)


class Flatten(nn.Module):
    @nn.compact
    def __call__(self, x, **_):
        return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------------- #
# Pooling
# --------------------------------------------------------------------------- #


class FastGlobalAvgPool(nn.Module):
    """Global average pool; pytorch_tools.FastGlobalAvgPool2d equivalent."""

    flatten: bool = True

    @nn.compact
    def __call__(self, x, **_):
        out = jnp.mean(x, axis=(1, 2), keepdims=not self.flatten)
        return out


class GEMPool(nn.Module):
    """Generalized-mean pooling (reference GEM_pool, model.py:756-771):
    avg(relu(x)^p)^(1/p) with learnable p."""

    p: float = 3.0
    eps: float = 1e-6
    flatten: bool = True

    @nn.compact
    def __call__(self, x, **_):
        p = self.param("p", lambda k: jnp.asarray(self.p, jnp.float32))
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None)
        out = jnp.mean(xf**p, axis=(1, 2), keepdims=not self.flatten) ** (1.0 / p)
        return out.astype(x.dtype)


class GEMPoolChannel(nn.Module):
    """GEM pool with per-channel learnable p (reference GEM_pool_channel,
    model.py:764-771)."""

    num_channels: int = 0
    eps: float = 1e-6
    flatten: bool = True

    @nn.compact
    def __call__(self, x, **_):
        p = self.param("p", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None)
        out = jnp.mean(xf**p, axis=(1, 2), keepdims=not self.flatten) ** (1.0 / p)
        return out.astype(x.dtype)


def max_pool(x, window: int = 3, stride: int = 2, padding: int = 1):
    """torch-style MaxPool2d(window, stride, padding) in NHWC, as plain
    reduce_window (flax nn.max_pool; backward lowers to select_and_scatter).

    A custom scatter-free backward (reshape+max with cumsum tie-routing for
    non-overlapping pools; per-offset argmax routing + dilated pads for
    overlapping ones) was built and A/B-measured on the v5-lite chip — and
    LOST, badly: 37x slower fwd+bwd at VGG pool shapes (the (n,h/2,2,w/2,2,c)
    reshape breaks the 128-lane layout and the tiny-axis cumsums lower to
    relayout storms), and -25% e2e on the r50 train step (64.8 vs 48.5
    ms/step; scripts/bench_maxpool_ab.py). XLA's select_and_scatter is within
    the step's fusion budget on TPU; see PERF.md "negative results"."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


class MaxPool(nn.Module):
    window: int = 3
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x, **_):
        return max_pool(x, self.window, self.stride, self.padding)


class AvgPool(nn.Module):
    """torch-style AvgPool2d (used by CModel configs, e.g. nn.AvgPool2d [2,2])."""

    window: int = 2
    stride: int = 2
    padding: int = 0

    @nn.compact
    def __call__(self, x, **_):
        return nn.avg_pool(
            x,
            window_shape=(self.window, self.window),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
        )


class BlurPool(nn.Module):
    """Anti-aliased downsampling (Zhang 2019); pytorch_tools BlurPool equivalent
    used as `pt.modules.BlurPool` in CModel configs and BResNet `antialias`.

    Depthwise conv with a fixed binomial kernel, stride 2. `channels` is
    accepted for config parity but inferred from the input.
    """

    channels: Optional[int] = None
    filt_size: int = 3
    stride: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, **_):
        c = x.shape[-1]
        a = np.poly1d([0.5, 0.5]) ** (self.filt_size - 1)  # binomial row
        filt1d = np.asarray(a.coeffs, dtype=np.float32)
        filt = np.outer(filt1d, filt1d)
        filt = filt / filt.sum()
        kernel = jnp.asarray(filt, dtype=x.dtype).reshape(self.filt_size, self.filt_size, 1, 1)
        kernel = jnp.tile(kernel, (1, 1, 1, c))  # HWIO for depthwise: (h, w, 1, C)
        pad = (self.filt_size - 1) // 2
        pad_hi = self.filt_size - 1 - pad
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=((pad, pad_hi), (pad, pad_hi)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


# --------------------------------------------------------------------------- #
# Regularization
# --------------------------------------------------------------------------- #


class DropPath(nn.Module):
    """Stochastic depth / DropConnect (pytorch_tools DropConnect equivalent;
    used via `keep_prob` in reference blocks, e.g. model.py:448,855)."""

    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if not train or self.keep_prob >= 1.0:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, self.keep_prob, shape)
        return jnp.where(mask, x / self.keep_prob, jnp.zeros_like(x))


class Dropout(nn.Module):
    """torch-style Dropout(p) that follows our `train` kwarg convention."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if not train or self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


# --------------------------------------------------------------------------- #
# Convolutions
# --------------------------------------------------------------------------- #


def _torch_padding(kernel_size: int, padding: Union[int, str]) -> Any:
    if isinstance(padding, str):
        return padding
    return ((padding, padding), (padding, padding))


def kaiming_normal_fanout(gain: float = math.sqrt(2.0)):
    """torchvision-style kaiming_normal_(mode='fan_out') for HWIO kernels."""

    def init(key, shape, dtype=jnp.float32):
        fan_out = shape[0] * shape[1] * shape[3]
        std = gain / math.sqrt(fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv(nn.Module):
    """Plain conv2d with torch-style integer padding semantics."""

    out_chs: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[int, str] = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = None
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

    @nn.compact
    def __call__(self, x, **_):
        # compute dtype follows the activations (bf16 under run.bf16) unless
        # pinned — otherwise flax promotes bf16 x with fp32 params to an fp32
        # conv, silently running config-built models at fp32 MXU rate. The
        # reference's AMP autocast likewise runs convs in half precision.
        return nn.Conv(
            features=self.out_chs,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_torch_padding(self.kernel_size, self.padding),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype or x.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
        )(x)


def conv3x3(in_chs: int, out_chs: int, stride: int = 1, groups: int = 1, bias: bool = False, **kw):
    del in_chs  # NHWC infers input channels; kept for reference-config parity
    return Conv(out_chs=out_chs, kernel_size=3, stride=stride, padding=1, groups=groups, use_bias=bias, **kw)


def conv1x1(in_chs: int, out_chs: int, stride: int = 1, bias: bool = False, **kw):
    del in_chs
    return Conv(out_chs=out_chs, kernel_size=1, stride=stride, padding=0, use_bias=bias, **kw)


class ScaledStdConv(nn.Module):
    """Conv2d with Scaled Weight Standardization (reference ScaledStdConv2d,
    model.py:31-141; NFNet paper arXiv:2101.08692).

    Forward-time weight standardization: per-output-channel zero-mean/unit-var
    over fan-in, times ``gain * gamma / sqrt(fan_in)``. Options mirror the
    reference: ``norm`` switches to weight *normalization* (zero-mean, unit
    L2 norm); ``n_heads`` averages head groups; ``partial_conv`` compensates
    zero padding at the edges (3x3/pad=1 only); ``coord_conv`` appends xy
    coordinate channels. Standardization is computed in float32.
    """

    out_chs: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[int, str] = 1
    groups: int = 1
    dilation: int = 1
    use_bias: bool = True
    gamma: float = 1.0
    gain_init: Optional[float] = 1.0
    eps: float = 1e-6
    n_heads: int = 1
    norm: bool = False
    single_gain: bool = False  # one scalar gain for all channels (ref config 36)
    partial_conv: bool = False
    coord_conv: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, **_):
        if self.coord_conv:
            b, h, w, _ = x.shape
            xx = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
            yy = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
            xx = jnp.broadcast_to(xx[None, None, :, None], (b, h, w, 1))
            yy = jnp.broadcast_to(yy[None, :, None, None], (b, h, w, 1))
            x = jnp.concatenate([x, xx, yy], axis=-1)

        in_chs = x.shape[-1]
        out_chs = self.out_chs * self.n_heads
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, in_chs // self.groups, out_chs),
            jnp.float32,
        )
        fan_in = k * k * (in_chs // self.groups)
        # gamma / sqrt(fan_in), * sqrt(n_heads) to compensate the head mean
        scale = self.gamma * fan_in**-0.5 * self.n_heads**0.5
        gain_shape = (1,) if self.single_gain else (out_chs,)
        if self.gain_init is not None:
            gain = self.param("gain", nn.initializers.constant(self.gain_init), gain_shape, jnp.float32)
        else:
            gain = jnp.ones(gain_shape, jnp.float32)

        w32 = kernel.astype(jnp.float32)
        if self.norm:
            w32 = w32 - jnp.mean(w32, axis=(0, 1, 2), keepdims=True)
            l2 = jnp.sqrt(jnp.sum(w32**2, axis=(0, 1, 2), keepdims=True))
            w32 = w32 / (l2 + self.eps) * (gain * scale)
        else:
            mean = jnp.mean(w32, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(w32, axis=(0, 1, 2), keepdims=True)
            w32 = (w32 - mean) * jax.lax.rsqrt(var + self.eps) * (gain * scale)
        weight = w32.astype(x.dtype)

        partial = self.partial_conv and self.padding == 1 and k == 3
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (out_chs,), jnp.float32)

        pad = _torch_padding(k, self.padding)
        out = jax.lax.conv_general_dilated(
            x,
            weight,
            window_strides=(self.stride, self.stride),
            padding=pad if not isinstance(pad, str) else pad,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.n_heads != 1:
            # bias is part of the conv (torch Conv2d(out*heads)), so it is
            # added BEFORE head averaging (reference model.py:101-119)
            if bias is not None:
                out = out + bias.astype(out.dtype)
                bias = None
            b, h, w, _ = out.shape
            out = out.reshape(b, h, w, self.n_heads, self.out_chs).mean(axis=3)

        if partial:
            # edge compensation: 9 / (number of valid taps) per output position
            h, w = out.shape[1], out.shape[2]
            ones = jnp.ones((1, h, w, 1), jnp.float32)
            kern = jnp.ones((3, 3, 1, 1), jnp.float32)
            cnt = jax.lax.conv_general_dilated(
                ones, kern, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            out = out * (9.0 / cnt).astype(out.dtype)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


def scaled_conv3x3(in_chs: int, out_chs: int, padding: int = 1, **kw):
    """Reference scaled_conv3x3 (model.py:144-148)."""
    del in_chs
    kw.setdefault("use_bias", kw.pop("bias", True))
    return ScaledStdConv(out_chs=out_chs, kernel_size=3, padding=padding, **kw)


def scaled_conv1x1(in_chs: int, out_chs: int, **kw):
    """Reference scaled_conv1x1 (model.py:151-152)."""
    del in_chs
    kw.setdefault("use_bias", kw.pop("bias", True))
    return ScaledStdConv(out_chs=out_chs, kernel_size=1, padding=0, **kw)


class Linear(nn.Module):
    """torch.nn.Linear equivalent (used as CModel head, e.g. 24.nf_conv-act.yaml)."""

    in_features: int = 0
    out_features: int = 0
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, **_):
        # follow activation dtype (see Conv) — AMP runs Linear in half too
        return nn.Dense(
            features=self.out_features,
            use_bias=self.use_bias,
            dtype=self.dtype or x.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.lecun_normal(),
        )(x)


def linear(in_features: int, out_features: int, bias: bool = True, **kw):
    return Linear(in_features=in_features, out_features=out_features, use_bias=bias, **kw)
