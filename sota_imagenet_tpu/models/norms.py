"""Normalization zoo (reference model.py:212-419 + ABN from pytorch_tools).

All NHWC (channel = last axis). Running statistics live in the flax
``batch_stats`` collection and are updated only when ``train=True``. Batch
statistics are computed in float32 regardless of activation dtype.

Cross-replica note: under jit with a global-view batch sharded on the data
mesh axis, reductions over the batch dimension are global, so BatchNorm is
*sync*-BN by construction — the TPU-idiomatic replacement for DDP's local BN
(SURVEY.md §5.8). inplace-abn's memory trick is unnecessary on TPU: XLA fuses
norm+activation and remat handles memory (SURVEY.md §2.3).

``run.bn_stats`` (config) selects the STATISTICS VIEW instead:
  * ``global`` (default): one mean/var over the global batch (sync-BN);
  * ``local``: statistics per data-shard — the reference's DDP per-GPU BN
    (reference train.py:114, all published accuracies incl. the 77.1% target
    used it), and it removes every BN all-reduce from the step on pods;
  * an int N: N statistics groups (grouped/"ghost" BN).
Implementation is a reshape (B,...)->(G, B/G, ...) with per-group reductions:
when the batch axis is sharded over G devices each group's rows live on ONE
device, so XLA compiles the stats with no cross-device collectives (verified
by counting all-reduces in the compiled 8-device HLO,
tests/test_local_bn.py). The normalize uses each sample's own group's stats —
bit-equal to running DDP's BN on each shard separately.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.layers import activation_from_name

from sota_imagenet_tpu.utils.dtypes import at_least_f32

Dtype = Any

# Process-wide default for the BN statistics grouping, set once from
# cfg.run.bn_stats before model build/jit (the same global-patch idiom the
# reference used for bn momentum, train.py:76 patch_bn_mom). A static Python
# value: changing it takes effect at the next trace.
_BN_STATS_GROUPS: int = 1


def set_bn_stats_groups(groups: int) -> None:
    global _BN_STATS_GROUPS
    _BN_STATS_GROUPS = max(int(groups), 1)


def bn_stats_groups() -> int:
    return _BN_STATS_GROUPS


def resolve_bn_stats(spec, data_devices: int) -> int:
    """Map config ``run.bn_stats`` (global | local | int) to a group count."""
    if spec in (None, "global", 1):
        return 1
    if spec == "local":
        return max(int(data_devices), 1)
    g = int(spec)
    if g < 1:
        raise ValueError(f"run.bn_stats must be 'global', 'local' or a positive int, got {spec!r}")
    return g


class _BNCore(nn.Module):
    """BatchNorm2d core with flax-compatible param/stat names ('scale','bias',
    'mean','var') and optional spatial SUBSAMPLING of the statistics.

    Why: profiling shows BN statistics reductions are ~47% of the ResNet-50
    step on TPU (HBM-bound; see ROADMAP.md). ``subsample=s`` computes batch
    stats over x[:, ::s, ::s, :] — 1/s² the reduction traffic with negligible
    estimator noise at ImageNet batch sizes (bs128 @ 56² still >100k samples
    per channel). subsample=1 reproduces flax nn.BatchNorm exactly.
    """

    momentum_flax: float = 0.9  # flax convention: new = m*old + (1-m)*batch
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    subsample: int = 1
    groups: int = 1  # statistics groups (see module docstring); 1 = sync-BN
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        g = max(int(self.groups), 1)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32) if self.use_scale else None
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32) if self.use_bias else None
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        dtype = self.dtype or x.dtype
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            s = max(int(self.subsample), 1)
            xs = x if s == 1 else x[:, ::s, ::s, :]
            if x.shape[0] % g:
                raise ValueError(f"bn_stats groups={g} must divide the batch ({x.shape[0]})")
            xf = at_least_f32(xs)
            if g > 1:
                xf = xf.reshape(g, xs.shape[0] // g, *xs.shape[1:])
            mean = jnp.mean(xf, axis=(-4, -3, -2))  # (C,) or (g, C)
            mean2 = jnp.mean(jnp.square(xf), axis=(-4, -3, -2))  # one pass: var = E[x²]-E[x]²
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum_flax
                # grouped running stats: EMA of the group-AVERAGED batch stats.
                # (DDP keeps one running buffer per replica and saves rank0's;
                # the group average is the same estimator without per-replica
                # state — documented deviation, E[group mean] identical.)
                b_mean = jnp.mean(mean, axis=0) if g > 1 else mean
                b_var = jnp.mean(var, axis=0) if g > 1 else var
                ra_mean.value = m * ra_mean.value + (1 - m) * b_mean
                ra_var.value = m * ra_var.value + (1 - m) * b_var
            if g > 1:
                # each sample is normalized by ITS group's statistics — the
                # exact DDP-local-BN forward. The reshape keeps groups aligned
                # with the batch sharding, so these broadcasts (like the stats
                # reductions above) stay device-local on the mesh.
                xg = x.astype(dtype).reshape(g, x.shape[0] // g, *x.shape[1:])
                inv = jax.lax.rsqrt(var + self.eps)
                y = (xg - mean[:, None, None, None, :].astype(dtype)) * inv[:, None, None, None, :].astype(dtype)
                y = y.reshape(x.shape)
                if scale is not None:
                    y = y * scale.astype(dtype)
                if bias is not None:
                    y = y + bias.astype(dtype)
                return y
        y = (x.astype(dtype) - mean.astype(dtype)) * jax.lax.rsqrt(var + self.eps).astype(dtype)
        if scale is not None:
            y = y * scale.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-style momentum (reference patches momentum to
    cfg.bn_momentum=0.1, train.py:76): new = (1-m)*old + m*batch.

    KNOWN convention delta vs torch (flax inherited, kept deliberately): the
    running_var buffer EMAs the BIASED batch variance; torch EMAs the
    unbiased one (factor n/(n-1), n = batch*H*W per channel). At production
    shapes the factor is <= 1.0004 (r50 @ 224) — no accuracy effect; the
    trajectory-parity test corrects for it explicitly
    (tests/test_trajectory_parity.py::_torch_rv_to_flax).

    ``subsample`` (default off) subsamples the statistics spatially — the
    profile-driven TPU optimization described in _BNCore/ROADMAP.md."""

    momentum: float = 0.1  # torch convention
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    subsample: int = 1
    stats_groups: Optional[int] = None  # None -> process default (set_bn_stats_groups)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        g = self.stats_groups if self.stats_groups is not None else bn_stats_groups()
        if self.subsample > 1 or g > 1:
            return _BNCore(
                momentum_flax=1.0 - self.momentum,
                eps=self.eps,
                use_scale=self.use_scale,
                use_bias=self.use_bias,
                subsample=self.subsample,
                groups=g,
                dtype=self.dtype,
                name="BatchNorm_0",  # keep the flax-nn.BatchNorm tree layout
            )(x, use_running_average=not train)
        # default: flax's BatchNorm (benched marginally faster than _BNCore
        # on TPU — 2632-2656 vs 2595 img/s r50 steps; same tree layout)
        # output dtype follows the activations (stats still accumulate in
        # fp32 inside flax); dtype=None would promote bf16 x to an fp32
        # output, dragging every downstream op to fp32 — see layers.Conv
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=self.dtype or x.dtype,
            param_dtype=jnp.float32,
        )(x)


class ABN(nn.Module):
    """Activated BatchNorm: BN + activation in one module (inplace-abn
    equivalent; reference BResNet uses `norm_layer: inplaceabn` with
    leaky_relu). XLA fuses the two ops; no custom kernel needed."""

    activation: str = "leaky_relu"
    momentum: float = 0.1
    eps: float = 1e-5
    frozen: bool = False  # `frozenabn`: always use running stats
    stats_groups: Optional[int] = None  # None -> process default
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        g = self.stats_groups if self.stats_groups is not None else bn_stats_groups()
        if g > 1:
            x = _BNCore(
                momentum_flax=1.0 - self.momentum,
                eps=self.eps,
                groups=g,
                dtype=self.dtype,
                name="BatchNorm_0",  # keep the flax-nn.BatchNorm tree layout
            )(x, use_running_average=(not train) or self.frozen)
        else:
            x = nn.BatchNorm(
                use_running_average=(not train) or self.frozen,
                momentum=1.0 - self.momentum,
                epsilon=self.eps,
                dtype=self.dtype or x.dtype,
                param_dtype=jnp.float32,
            )(x)
        return activation_from_name(self.activation)(x)


class AGN(nn.Module):
    """Activated GroupNorm — the legacy ``norm_layer: agn`` (pytorch-tools
    AGN, used by _old_configs/_first_attempts/BResNet50_encoder_agn.yaml):
    GroupNorm + activation in one module, the batch-independent sibling of
    ABN."""

    activation: str = "leaky_relu"
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        g = math.gcd(self.num_groups, x.shape[-1])
        x = nn.GroupNorm(num_groups=g, epsilon=self.eps, dtype=self.dtype or x.dtype, param_dtype=jnp.float32)(x)
        return activation_from_name(self.activation)(x)


class EstimatedABN(nn.Module):
    """Activated BN normalizing with the running ("estimated") statistics in
    BOTH train and eval, while still updating them from the batch during
    training — the legacy ``norm_layer: estimated_abn``
    (_old_configs/_exp85-114_configs). Removes the train/eval normalization
    gap at the cost of slightly stale statistics (Batch-Renorm without the
    r/d correction)."""

    activation: str = "leaky_relu"
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        mean, var = ra_mean.value, ra_var.value
        if train and not self.is_initializing():
            xf = at_least_f32(x)
            axes = tuple(range(x.ndim - 1))
            bmean = jnp.mean(xf, axis=axes)
            bvar = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(bmean)
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * bmean
            ra_var.value = (1 - m) * ra_var.value + m * jnp.maximum(bvar, 0.0)
        dt = self.dtype or x.dtype
        inv = (jax.lax.rsqrt(var + self.eps) * scale).astype(dt)
        x = x.astype(dt) * inv + (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(dt)
        return activation_from_name(self.activation)(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, **_):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype or x.dtype, param_dtype=jnp.float32
        )(x)


class ScaleNorm(nn.Module):
    """x * scale / ||x||_channels (reference model.py:212-224)."""

    eps: float = 1e-5
    trainable: bool = True

    @nn.compact
    def __call__(self, x, **_):
        if self.trainable:
            scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
        else:
            scale = jnp.ones((1,), jnp.float32)
        xf = at_least_f32(x)
        norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
        out = xf * (scale / jnp.clip(norm, self.eps, None))
        return out.astype(x.dtype)


class Affine(nn.Module):
    """x * value, optionally trainable (reference model.py:227-240)."""

    value: float = 1.0
    trainable: bool = False

    @nn.compact
    def __call__(self, x, **_):
        if self.trainable:
            v = self.param("value", nn.initializers.constant(self.value), (), jnp.float32)
        else:
            v = jnp.asarray(self.value, jnp.float32)
        return x * v.astype(x.dtype)


class Gain(nn.Module):
    """Per-channel learnable gain, init 1 (reference model.py:243-253).
    Excluded from weight decay via `filter_from_wd: [gain]`."""

    size: int = 0

    @nn.compact
    def __call__(self, x, **_):
        gain = self.param("gain", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return x * gain.astype(x.dtype)


def _clamped_ratio(num: jnp.ndarray, den: jnp.ndarray, lo: float = 0.2, hi: float = 5.0) -> jnp.ndarray:
    """Batch-ReNorm style correction factor, detached (reference clamps 1/5..5,
    model.py:262,298,307,378)."""
    return jax.lax.stop_gradient(jnp.clip(num / den, lo, hi))


class FRNv1(nn.Module):
    """Filter Response Norm v1 (reference model.py:256-289): per-channel batch
    RMS + re-normalization against a running RMS so train/val distributions
    match. Affine weight/bias."""

    num_features: int = 0
    eps: float = 1e-5
    momentum: float = 0.95  # EMA decay of the running RMS
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32) if self.use_bias else 0.0
        running = self.variable("batch_stats", "running_var", lambda: jnp.ones((c,), jnp.float32))
        xf = at_least_f32(x)
        if train:
            x2 = jnp.mean(xf**2, axis=(0, 1, 2))  # per-channel batch RMS²
            y = xf * jax.lax.rsqrt(x2 + self.eps)
            if not self.is_initializing():
                running.value = self.momentum * running.value + (1 - self.momentum) * jax.lax.stop_gradient(x2)
            r = _clamped_ratio(jnp.sqrt(x2 + self.eps), jnp.sqrt(running.value))
            y = y * r
        else:
            y = xf * jax.lax.rsqrt(running.value + self.eps)
        return (y * weight + bias).astype(x.dtype)


class FRNv2(nn.Module):
    """FRN v2 (reference model.py:292-345): per-sample LN-RMS then per-sample
    per-channel IN-RMS, each re-normalized by running batch averages. No batch
    dependence at inference."""

    num_features: int = 0
    eps: float = 1e-5
    momentum: float = 0.95

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        single_running = self.variable("batch_stats", "single_running_var", lambda: jnp.ones((), jnp.float32))
        running = self.variable("batch_stats", "running_var", lambda: jnp.ones((c,), jnp.float32))
        xf = at_least_f32(x)
        if train:
            x2_ln = jnp.mean(xf**2, axis=(1, 2, 3), keepdims=True)  # per-sample
            y = xf * jax.lax.rsqrt(x2_ln + self.eps)
            if not self.is_initializing():
                single_running.value = self.momentum * single_running.value + (1 - self.momentum) * jax.lax.stop_gradient(jnp.mean(x2_ln))
            y = y * _clamped_ratio(jnp.sqrt(x2_ln + self.eps), jnp.sqrt(single_running.value))
            x2_in = jnp.mean(y**2, axis=(1, 2), keepdims=True)  # per-sample, per-channel
            y = y * jax.lax.rsqrt(x2_in + self.eps)
            if not self.is_initializing():
                running.value = self.momentum * running.value + (1 - self.momentum) * jax.lax.stop_gradient(jnp.mean(x2_in, axis=0).reshape(c))
            y = y * _clamped_ratio(jnp.sqrt(x2_in + self.eps), jnp.sqrt(running.value))
        else:
            y = xf * jax.lax.rsqrt(single_running.value + self.eps) * jax.lax.rsqrt(running.value + self.eps)
        return (y * weight + bias).astype(x.dtype)


class VarEMA(nn.Module):
    """Normalize by an EMA of the (global) std, Batch-ReNorm style clamp
    (reference model.py:348-383). The reference computes *scalar* std/mean
    (its per-channel line is immediately overwritten, model.py:366-367); we
    reproduce that effective behavior with scalar running stats.

    ``use=False`` turns it into a pure monitor (stats recorded, identity fwd).
    """

    n_channels: int = 0  # accepted for config parity; stats are scalar
    use: bool = True
    decay: float = 0.95
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        std_ema = self.variable("batch_stats", "std_ema", lambda: jnp.ones((), jnp.float32))
        mean_ema = self.variable("batch_stats", "mean_ema", lambda: jnp.zeros((), jnp.float32))
        xf = at_least_f32(x)
        if train:
            std = jnp.std(xf)
            mean = jnp.mean(xf)
            if not self.is_initializing():
                std_ema.value = self.decay * std_ema.value + (1 - self.decay) * jax.lax.stop_gradient(std)
                mean_ema.value = self.decay * mean_ema.value + (1 - self.decay) * jax.lax.stop_gradient(mean)
            if not self.use:
                return x
            r = _clamped_ratio(std, std_ema.value)
            return (xf / (std + self.eps) * r).astype(x.dtype)
        if not self.use:
            return x
        return (xf / std_ema.value).astype(x.dtype)


class MeanEMA(nn.Module):
    """Per-sample centering (reference model.py:403-419 — its EMA path is
    commented out; effective forward is x - mean(x, per-sample))."""

    decay: float = 0.99

    @nn.compact
    def __call__(self, x, **_):
        xf = at_least_f32(x)
        return (xf - jnp.mean(xf, axis=(1, 2, 3), keepdims=True)).astype(x.dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, **_):
        return x


_NORMS = {
    "bn": BatchNorm,
    "batchnorm": BatchNorm,
    "abn": ABN,
    "inplaceabn": ABN,  # fused by XLA on TPU (SURVEY.md §2.3)
    "frozenabn": lambda **kw: ABN(frozen=True, **kw),
    "agn": AGN,
    "estimated_abn": EstimatedABN,
    "gn": GroupNorm,
    "groupnorm": GroupNorm,
    "frn": FRNv1,
    "frnv1": FRNv1,
    "frnv2": FRNv2,
    "varema": VarEMA,
    "scalenorm": ScaleNorm,
    "meanema": MeanEMA,
    "none": Identity,
    "identity": Identity,
}


def norm_from_name(name: str) -> Callable[..., nn.Module]:
    key = name.strip().strip("'\"").lower()
    if key not in _NORMS:
        raise KeyError(f"unknown norm {name!r}; known: {sorted(_NORMS)}")
    return _NORMS[key]
