"""Weight parametrizations (reference callbacks.py:62-123 +
`weight_standardization` flag, reference train.py:66-67).

torch's ``nn.utils.parametrize`` re-computes an effective weight from the
stored weight on every forward, with gradients flowing through the transform.
The functional JAX equivalent: a pure function over the params pytree applied
inside the model's ``apply`` — same autodiff semantics, and XLA folds the
(cheap) transform into the forward graph.

``ParametrizedModel`` wraps any linen module with such a transform so both the
jitted train step and eval step see the parametrized weights (torch
parametrize is also active at eval).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def _is_conv_kernel(path, leaf) -> bool:
    name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
    return leaf.ndim == 4 and "kernel" in name


def _map_kernels(params, fn: Callable[[jnp.ndarray], jnp.ndarray], predicate=_is_conv_kernel):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [fn(leaf) if predicate(path, leaf) else leaf for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def zero_mean_conv_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel zero mean (pytorch_tools zero_mean_conv_weight;
    ForwardWeightNorm use_std=False, reference callbacks.py:67-72).
    HWIO: output channel is the last axis."""
    return w - jnp.mean(w, axis=(0, 1, 2), keepdims=True)


def normalize_conv_weight(w: jnp.ndarray, gamma: float = 1.0, eps: float = 1e-6) -> jnp.ndarray:
    """Scaled weight standardization (pytorch_tools normalize_conv_weight;
    ForwardWeightNorm use_std=True): per-output-channel standardize, scale by
    gamma / sqrt(fan_in) — NFNet convention (arXiv:2101.08692)."""
    w32 = w.astype(jnp.float32)
    mean = jnp.mean(w32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w32, axis=(0, 1, 2), keepdims=True)
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    out = (w32 - mean) * jax.lax.rsqrt(var + eps) * (gamma * fan_in**-0.5)
    return out.astype(w.dtype)


def spectral_normalize(w: jnp.ndarray, n_iters: int = 5, eps: float = 1e-12) -> jnp.ndarray:
    """Spectral normalization w / sigma_max (ForwardSpectralNorm, reference
    callbacks.py:87-101). Stateless deterministic power iteration from a fixed
    init (the torch version carries a persistent u vector; n_iters=5 from a
    fixed start converges equivalently for training purposes)."""
    mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)  # (fan_in, out)
    u = jnp.ones((mat.shape[1],), jnp.float32) / jnp.sqrt(mat.shape[1])
    for _ in range(n_iters):
        v = mat @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), eps)
        u = mat.T @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)
    sigma = v @ (mat @ u)
    return (w.astype(jnp.float32) / jnp.maximum(sigma, eps)).astype(w.dtype)


def weight_standardization_fn(gamma: Optional[float] = None) -> Callable:
    """Params transform for ForwardWeightNorm / the `weight_standardization`
    config flag (reference conv_to_ws_conv, train.py:66-67)."""
    if gamma is None:
        return lambda params: _map_kernels(params, zero_mean_conv_weight)
    return lambda params: _map_kernels(params, lambda w: normalize_conv_weight(w, gamma))


def spectral_norm_fn(n_iters: int = 5) -> Callable:
    return lambda params: _map_kernels(params, lambda w: spectral_normalize(w, n_iters))


def backward_weight_norm(params) -> Any:
    """Backward centered weight normalization applied to params AFTER each
    optimizer step (reference WeightNorm callback, callbacks.py:104-123):
    per-row zero-mean + unit L2 norm, for weights with >= 64 elements."""

    def norm(w):
        mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)  # (fan_in, out)
        mat = mat - jnp.mean(mat, axis=0, keepdims=True)
        mat = mat / jnp.maximum(jnp.linalg.norm(mat, axis=0, keepdims=True), 1e-12)
        return mat.reshape(w.shape).astype(w.dtype)

    def pred(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        return leaf.ndim >= 2 and "kernel" in name and leaf.size >= 64

    return _map_kernels(params, norm, pred)


class ParametrizedModel:
    """Wrap a linen module with a params transform active in train AND eval."""

    def __init__(self, model, param_fn: Callable):
        self._model = model
        self._param_fn = param_fn

    def init(self, *args, **kwargs):
        return self._model.init(*args, **kwargs)

    def apply(self, variables, *args, **kwargs):
        variables = dict(variables)
        variables["params"] = self._param_fn(variables["params"])
        return self._model.apply(variables, *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._model, name)
