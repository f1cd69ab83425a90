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


def _is_ungrouped_conv_kernel(path, leaf) -> bool:
    """Conv kernel that is NOT depthwise. The reference ForwardWeightNorm only
    parametrizes ``nn.Conv2d`` with ``groups == 1`` (callbacks.py:75-78); in a
    flax HWIO kernel (kh, kw, in/groups, out) a depthwise conv has
    ``shape[2] == 1``, which is the grouping signal visible from the params
    pytree (grouped-but-not-depthwise convs are indistinguishable here and do
    not occur in the zoo's WS configs)."""
    return _is_conv_kernel(path, leaf) and leaf.shape[2] > 1


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
    config flag (reference conv_to_ws_conv, train.py:66-67). Depthwise convs
    are skipped like the reference's ``groups == 1`` filter."""
    if gamma is None:
        return lambda params: _map_kernels(params, zero_mean_conv_weight, _is_ungrouped_conv_kernel)
    return lambda params: _map_kernels(params, lambda w: normalize_conv_weight(w, gamma), _is_ungrouped_conv_kernel)


def spectral_norm_fn(n_iters: int = 5) -> Callable:
    return lambda params: _map_kernels(params, lambda w: spectral_normalize(w, n_iters))


# --------------------------------------------------------------------------- #
# Stateful spectral norm (torch-parity: persistent u/v power-iteration state)
# --------------------------------------------------------------------------- #

SPECTRAL_STATE_KEY = "__spectral_norm__"


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


class SpectralNormParametrization:
    """torch.nn.utils.parametrizations.spectral_norm semantics (the reference
    ForwardSpectralNorm, callbacks.py:87-101): a PERSISTENT ``u``/``v`` pair
    per conv kernel, ``n_iters`` power iterations per *training* forward
    (torch default 1), u/v treated as constants by autodiff, and eval reusing
    the stored vectors without iterating. The state rides in the
    ``batch_stats`` collection under ``SPECTRAL_STATE_KEY`` — like torch
    buffers ride the state_dict — so it is checkpointed, EMA'd, and threaded
    through the jitted step with no special cases."""

    stateful = True

    def __init__(self, n_iters: int = 1, eps: float = 1e-12):
        self.n_iters = n_iters
        self.eps = eps

    def _kernels(self, params):
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        return [(p, leaf) for p, leaf in flat if _is_conv_kernel(p, leaf)]

    def _power_iter(self, mat, u, n):
        """mat is (fan_in, out) = W_tᵀ of torch's (out, fan_in) weight_mat.
        v = normalize(mat @ u) ∈ R^fan_in; u = normalize(matᵀ @ v) ∈ R^out."""
        for _ in range(n):
            v = mat @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), self.eps)
            u = mat.T @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), self.eps)
        return u, v

    def init_state(self, params):
        """Seeded-normal u + 15 power iterations, matching torch's
        _SpectralNorm.__init__ warm start."""
        import zlib

        state = {}
        for path, w in self._kernels(params):
            name = _path_name(path)
            mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
            key = jax.random.PRNGKey(zlib.crc32(name.encode()) & 0x7FFFFFFF)
            u = jax.random.normal(key, (mat.shape[1],), jnp.float32)
            u = u / jnp.maximum(jnp.linalg.norm(u), self.eps)
            u, v = self._power_iter(mat, u, 15)
            state[name] = {"u": u, "v": v}
        return state

    def __call__(self, params, state, update: bool):
        new_state = dict(state)

        def transform(path, w):
            name = _path_name(path)
            entry = state[name]
            u, v = entry["u"], entry["v"]
            mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
            if update:
                u, v = self._power_iter(jax.lax.stop_gradient(mat), u, self.n_iters)
                new_state[name] = {"u": u, "v": v}
            # sigma differentiates through w only; u/v are constants (torch
            # computes sigma = u · (W_t v) with buffer u/v under no_grad)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            sigma = u @ (mat.T @ v)
            return (w.astype(jnp.float32) / jnp.maximum(sigma, self.eps)).astype(w.dtype)

        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        out = [transform(p, leaf) if _is_conv_kernel(p, leaf) else leaf for p, leaf in flat]
        return jax.tree_util.tree_unflatten(treedef, out), new_state


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
    """Wrap a linen module with a params transform active in train AND eval.

    Stateless transforms are plain ``params -> params`` callables. A transform
    with ``stateful = True`` (e.g. :class:`SpectralNormParametrization`) also
    carries per-kernel state in ``batch_stats[SPECTRAL_STATE_KEY]``: ``init``
    seeds it, ``apply`` pops it before the inner module sees the collection,
    updates it on training forwards, and splices the new state into the
    mutated ``batch_stats`` returned to the train step."""

    def __init__(self, model, param_fn: Callable):
        self._model = model
        self._param_fn = param_fn
        self._stateful = bool(getattr(param_fn, "stateful", False))

    def init(self, *args, **kwargs):
        variables = self._model.init(*args, **kwargs)
        if self._stateful:
            variables = dict(variables)
            bs = dict(variables.get("batch_stats", {}))
            bs[SPECTRAL_STATE_KEY] = self._param_fn.init_state(variables["params"])
            variables["batch_stats"] = bs
        return variables

    def apply(self, variables, *args, **kwargs):
        variables = dict(variables)
        if not self._stateful:
            variables["params"] = self._param_fn(variables["params"])
            return self._model.apply(variables, *args, **kwargs)

        bs = dict(variables.get("batch_stats", {}))
        state = bs.pop(SPECTRAL_STATE_KEY, None)
        if state is None:
            state = self._param_fn.init_state(variables["params"])
        update = bool(kwargs.get("train", False))
        new_params, new_state = self._param_fn(variables["params"], state, update)
        variables["params"] = new_params
        variables["batch_stats"] = bs
        out = self._model.apply(variables, *args, **kwargs)
        if kwargs.get("mutable"):
            y, updated = out
            updated = dict(updated)
            ubs = dict(updated.get("batch_stats", {}))
            ubs[SPECTRAL_STATE_KEY] = new_state
            updated["batch_stats"] = ubs
            return y, updated
        return out

    def __getattr__(self, name):
        return getattr(self._model, name)
