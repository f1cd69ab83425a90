"""Attention modules (reference model.py:471-655 + pytorch_tools get_attn).

Channel attention throughout — XCA/UFO attend channels-to-channels so cost is
linear in H·W (the reference's long-"sequence" trick, SURVEY.md §5.7). All
NHWC; matmuls carry ``preferred_element_type=float32`` so the MXU accumulates
in fp32 under bf16 activations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.layers import ScaledStdConv, Conv

Dtype = Any


def _l2norm(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


class SE(nn.Module):
    """Squeeze-and-Excitation with reduction."""

    channels: int = 0
    reduction: int = 16

    @nn.compact
    def __call__(self, x, **_):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        s = nn.Dense(max(c // self.reduction, 8), param_dtype=jnp.float32)(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, param_dtype=jnp.float32)(s)
        gate = jax.nn.sigmoid(s).astype(x.dtype)
        return x * gate[:, None, None, :]


class SEVar3(nn.Module):
    """SE without dimensionality reduction (ECA paper SE-Var3; pytorch_tools
    SEVar3, used by reference ConvActBlock sse option, model.py:624-655)."""

    channels: int = 0
    scaled: bool = False

    @nn.compact
    def __call__(self, x, **_):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        if self.scaled:
            s = ScaledStdConv(out_chs=c, kernel_size=1, padding=0)(s)
        else:
            s = Conv(out_chs=c, kernel_size=1, padding=0, use_bias=True)(s)
        return x * jax.nn.sigmoid(s).astype(x.dtype)


class SEVar3Mod(nn.Module):
    """Reference SEVar3_Mod (model.py:624-655): returns 0 when in_chs != out_chs
    so the calling block's sum just skips it."""

    in_chs: int = 0
    out_chs: int = 0
    scaled: bool = False

    @nn.compact
    def __call__(self, x, **_):
        if self.in_chs != self.out_chs:
            return jnp.zeros((), x.dtype)
        return SEVar3(channels=self.out_chs, scaled=self.scaled)(x)


class ECA(nn.Module):
    """Efficient Channel Attention: 1-D conv over the pooled channel vector."""

    channels: int = 0
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, **_):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, C)
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, 1, 1), jnp.float32)
        s = jax.lax.conv_general_dilated(
            s[:, :, None],  # (B, C, 1) as NWC
            kernel,
            window_strides=(1,),
            padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :, 0]
        gate = jax.nn.sigmoid(s).astype(x.dtype)
        return x * gate[:, None, None, :]


class XCA(nn.Module):
    """Cross-Covariance Attention (reference XCA_mod, model.py:471-528;
    XCiT arXiv:2106.09681). Channels attend to channels: softmax over the
    C'×C' cross-covariance of l2-normalized q,k, per head, with a learnable
    temperature. Optional trailing projection and built-in residual."""

    dim: int = 0
    num_heads: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    last_proj: bool = False
    residual: bool = True
    v_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        b, h, w, c = x.shape
        hd, cp = self.num_heads, c // self.num_heads
        temp = self.param("temperature", nn.initializers.ones, (hd, 1, 1), jnp.float32)
        qkv = ScaledStdConv(out_chs=3 * c, kernel_size=1, padding=0, name="qkv")(x)
        # (B,H,W,3C) -> (B, HW, 3, Hd, C') -> 3 x (B, Hd, C', HW)
        qkv = qkv.reshape(b, h * w, 3, hd, cp).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = _l2norm(q.astype(jnp.float32), axis=-1)
        k = _l2norm(k.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k, preferred_element_type=jnp.float32) * temp
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_drop:
            attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=not train)
        if self.v_norm:
            temp2 = self.param("temperature2", nn.initializers.ones, (hd, 1, 1), jnp.float32)
            v = _l2norm(v.astype(jnp.float32), axis=-2) * temp2
        out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 3, 1, 2).reshape(b, h, w, c)
        if self.last_proj:
            out = ScaledStdConv(out_chs=c, kernel_size=1, padding=0, name="proj")(out)
            if self.proj_drop:
                out = nn.Dropout(rate=self.proj_drop)(out, deterministic=not train)
        return x + out if self.residual else out


class UFO(nn.Module):
    """UFO-ViT attention (reference UFO_mod, model.py:530-588): softmax-free,
    XN(q@kᵀ) with per-head temperatures; v l2-normalized over channels."""

    dim: int = 0
    out_dim: Optional[int] = None
    num_heads: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    last_proj: bool = False
    residual: bool = True
    qk_norm: bool = False
    prelast_act: bool = False
    # pre-normalize the input before qkv (reference config 82 "my-attn" names a
    # removed option; standard pre-norm attention is the faithful reading)
    prenorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        if self.prenorm:
            x = nn.LayerNorm(use_bias=False, use_scale=True, dtype=x.dtype, name="prenorm")(x)
        b, h, w, c = x.shape
        out_dim = self.out_dim or c
        hd, cp = self.num_heads, c // self.num_heads
        temp = self.param("temperature", nn.initializers.ones, (hd, 1, 1), jnp.float32)
        temp2 = self.param("temperature2", nn.initializers.ones, (hd, 1, 1), jnp.float32)
        qkv = Conv(out_chs=3 * c, kernel_size=1, padding=0, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, hd, cp).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0].astype(jnp.float32), qkv[1].astype(jnp.float32), qkv[2].astype(jnp.float32)
        if self.qk_norm:
            q = q / (q.shape[-1] ** 0.25)
            k = k / (k.shape[-1] ** 0.25)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k, preferred_element_type=jnp.float32)
        attn = _l2norm(attn, axis=-1) * temp
        if self.attn_drop:
            attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=not train)
        v_hat = _l2norm(v, axis=-2) * temp2
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v_hat, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 3, 1, 2).reshape(b, h, w, c)
        if self.prelast_act:
            out = jax.nn.hard_silu(out)
        if self.last_proj:
            out = ScaledStdConv(out_chs=out_dim, kernel_size=1, padding=0, name="proj")(out)
            if self.proj_drop:
                out = nn.Dropout(rate=self.proj_drop)(out, deterministic=not train)
        return x + out if self.residual else out


class FCA(nn.Module):
    """Frequency Channel Attention (FcaNet, arXiv:2012.11879; the legacy
    ``attn_type: fca`` / ``fca-eca`` configs, e.g.
    _old_configs/_exp85-114_configs). GAP is replaced by multi-spectral DCT-II
    pooling: channels split into ``num_freq`` groups, each pooled against a
    different low-frequency 2-D DCT basis (precomputed at trace time — shapes
    are static under jit), followed by an SE-style bottleneck (``eca=False``)
    or an ECA 1-D conv (``eca=True``). ``temperature`` scales the gate logits."""

    channels: int = 0
    num_freq: int = 16
    reduction: int = 16
    temperature: float = 1.0
    eca: bool = False

    @nn.compact
    def __call__(self, x, **_):
        b, h, w, c = x.shape
        n = min(self.num_freq, c)
        # low-frequency (u,v) pairs in zigzag order (FcaNet's top-16 selection)
        uv = sorted(((u, v) for u in range(4) for v in range(4)), key=lambda p: (p[0] + p[1], p[0]))[:n]
        iy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        ix = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        basis = jnp.stack(
            [jnp.cos(jnp.pi * u * iy)[:, None] * jnp.cos(jnp.pi * v * ix)[None, :] for u, v in uv]
        )  # (n, H, W)
        xf = x.astype(jnp.float32)
        # channel group g pools with basis g
        group = (jnp.arange(c) * n) // c  # (C,) static
        sel = basis[group]  # (C, H, W)
        s = jnp.einsum("bhwc,chw->bc", xf, sel) / (h * w)
        if self.eca:
            k = 3
            kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, 1, 1), jnp.float32)
            s = jax.lax.conv_general_dilated(
                s[:, :, None], kernel, (1,), [(k // 2, k // 2)], dimension_numbers=("NWC", "WIO", "NWC")
            )[:, :, 0]
        else:
            s = nn.Dense(max(c // self.reduction, 8), param_dtype=jnp.float32)(s)
            s = jax.nn.relu(s)
            s = nn.Dense(c, param_dtype=jnp.float32)(s)
        gate = jax.nn.sigmoid(s / self.temperature)
        return x * gate[:, None, None, :].astype(x.dtype)


_ATTN = {
    "se": lambda chs, **kw: SE(channels=chs, **kw),
    "eca": lambda chs, **kw: ECA(channels=chs, kernel_size=kw.pop("kernel_size", 3), **kw),
    "eca9": lambda chs, **kw: ECA(channels=chs, kernel_size=9, **kw),
    "sevar3": lambda chs, **kw: SEVar3(channels=chs, **kw),
    "se-var3": lambda chs, **kw: SEVar3(channels=chs, **kw),
    "xca": lambda chs, **kw: XCA(dim=chs, **kw),
    "ufo": lambda chs, **kw: UFO(dim=chs, **kw),
    "fca": lambda chs, **kw: FCA(channels=chs, **kw),
    "fca-eca": lambda chs, **kw: FCA(channels=chs, eca=True, **kw),
}


def get_attn(name: Optional[str]) -> Callable[..., nn.Module]:
    """pytorch_tools get_attn equivalent (used via `attention_type: 'eca9'`
    in reference configs, e.g. 24.nf_conv-act.yaml)."""
    if name is None:
        return lambda chs, **kw: None
    key = name.strip().strip("'\"").lower()
    if key not in _ATTN:
        raise KeyError(f"unknown attention {name!r}; known: {sorted(_ATTN)}")
    return _ATTN[key]
