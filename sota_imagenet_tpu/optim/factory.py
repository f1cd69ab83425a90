"""Optimizer factory: config dict → optax GradientTransformation.

Replaces the reference's optimizer instantiation (train.py:92) and its fused
`torch._foreach_*` / apex paths — under jit, optax's tree-mapped updates fuse
into a handful of XLA kernels (SURVEY.md §2.3).

Builders take ``learning_rate`` (float or schedule of the update count) and
OWN the lr/wd coupling, matching torch semantics per optimizer:
  * sgd — coupled L2 (grad += wd·param before momentum), lr scales the buffer;
  * adamw/lamb — decoupled decay à la AdamW;
  * novograd/adai/adais/madgrad/adam_layerwise/adamp — see optim/zoo.py.

Weight-decay filtering: the reference builds param groups via
``filter_from_weight_decay`` (train.py:83-89); here it's a boolean mask pytree
(utils.misc.filter_from_weight_decay) passed as ``wd_mask``.

Progressive-resize note: rebuilding a transform with a new schedule keeps the
optimizer *state* valid (same tree structure), so stage changes don't reset
momenta.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

from sota_imagenet_tpu.optim import zoo

Schedule = Union[float, Callable]

_BUILDERS: Dict[str, Callable[..., optax.GradientTransformation]] = {}

_OPTIM_ALIASES = {
    "torch.optim._multi_tensor.SGD": "sgd",
    "torch.optim.SGD": "sgd",
    "SGD": "sgd",
    "pytorch_tools.optim.adamw.AdamW": "adamw",
    "torch.optim.AdamW": "adamw",
    "AdamW": "adamw",
    "badam.BAdam": "badam",
    "BAdam": "badam",
    "adamp.AdamP": "adamp",
    "AdamP": "adamp",
    "apex.optimizers.FusedNovoGrad": "novograd",
    "src.optimizers.MyNovograd": "novograd",
    "MyNovograd": "novograd",
    "src.optimizers.NovogradApex": "novograd",
    "NovogradApex": "novograd",
    "src.optimizers.AdamLayerwise": "adam_layerwise",
    "AdamLayerwise": "adam_layerwise",
    "src.optimizers.MyAdai": "adai",
    "MyAdai": "adai",
    "src.optimizers.AdaiS": "adais",
    "AdaiS": "adais",
    "src.optimizers.MADGRAD": "madgrad",
    "MADGRAD": "madgrad",
    # legacy flat-schema names (pytorch-tools optimizer_from_name; the fused_*
    # prefix meant apex multi-tensor variants of the same math)
    "fused_sgd": "sgd",
    "fused_adam": "adamw",
    "fused_novograd": "novograd",
    "RMSprop": "rmsprop",
    "torch.optim.RMSprop": "rmsprop",
    "SGDP": "sgdp",
}


def register_optimizer(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


def _mask_wd(wd_tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    if mask is None:
        return wd_tx
    return optax.masked(wd_tx, mask)


@register_optimizer("sgd")
def sgd(
    learning_rate: Schedule,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(_mask_wd(optax.add_decayed_weights(weight_decay), wd_mask))
    if momentum:
        # torch buffer: b = m·b + g ; update uses b (or g + m·b for nesterov)
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


@register_optimizer("adamw")
def adamw(
    learning_rate: Schedule,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        _mask_wd(optax.add_decayed_weights(weight_decay), wd_mask) if weight_decay else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


@register_optimizer("lamb")
def lamb(
    learning_rate: Schedule,
    betas=(0.9, 0.999),
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """LAMB (the reference reaches it via badam.BAdam(lamb=True),
    41.nf_conv-act_lamb.yaml)."""
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        _mask_wd(optax.add_decayed_weights(weight_decay), wd_mask) if weight_decay else optax.identity(),
        optax.scale_by_trust_ratio(),
        optax.scale_by_learning_rate(learning_rate),
    )


@register_optimizer("badam")
def badam(learning_rate: Schedule, lamb_mode: bool = False, lamb: bool = False, **kw) -> optax.GradientTransformation:
    """bonlime's BAdam (external package in the reference): AdamW-family with a
    LAMB trust-ratio switch. We map lamb=True -> LAMB, else AdamW."""
    if lamb or lamb_mode:
        return _BUILDERS["lamb"](learning_rate, **kw)
    return _BUILDERS["adamw"](learning_rate, **kw)


# zoo
register_optimizer("novograd")(zoo.novograd)
register_optimizer("adam_layerwise")(zoo.adam_layerwise)
register_optimizer("adai")(zoo.adai)
register_optimizer("adais")(zoo.adais)
register_optimizer("madgrad")(zoo.madgrad)
register_optimizer("adamp")(zoo.adamp)
register_optimizer("rmsprop")(zoo.rmsprop)
register_optimizer("sgdp")(zoo.sgdp)


class _LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: Any
    inner: Any


def lookahead(
    inner: optax.GradientTransformation, k: int = 5, alpha: float = 0.5
) -> optax.GradientTransformation:
    """Lookahead (arXiv:1907.08610; legacy flat-schema key ``lookahead: true``,
    e.g. _old_configs/_first_attempts/resnet34_best.yaml). The inner ("fast")
    optimizer steps normally; every ``k`` steps the slow weights move
    ``alpha`` of the way to the fast weights and the fast weights reset to
    them. Self-contained GradientTransformation (state carries the slow copy)
    so TrainState/checkpointing see one ordinary optimizer."""

    def init(params):
        return _LookaheadState(
            jnp.zeros((), jnp.int32), jax.tree_util.tree_map(jnp.asarray, params), inner.init(params)
        )

    def update(grads, state, params):
        fast_updates, inner_state = inner.update(grads, state.inner, params)
        count = state.count + 1
        sync = count % k == 0

        def upd_leaf(p, u, s):
            slow_new = s + alpha * (p + u - s)
            return jnp.where(sync, slow_new - p, u)

        def slow_leaf(p, u, s):
            slow_new = s + alpha * (p + u - s)
            return jnp.where(sync, slow_new, s)

        updates = jax.tree_util.tree_map(upd_leaf, params, fast_updates, state.slow)
        slow = jax.tree_util.tree_map(slow_leaf, params, fast_updates, state.slow)
        return updates, _LookaheadState(count, slow, inner_state)

    return optax.GradientTransformation(init, update)


def agc(clipping: float = 0.01, eps: float = 1e-3) -> Callable:
    """Adaptive Gradient Clipping (NFNet arXiv:2102.06171; reference uses the
    pytorch_tools AdaptiveGradientClipping callback). Returns a
    grads-transform fn(grads, params) -> grads for use as a step option."""

    def clip(grads, params):
        def one(g, p):
            pn = jnp.maximum(zoo._unitwise_norm(p), eps)
            gn = jnp.maximum(zoo._unitwise_norm(g), 1e-6)
            clipped = g * (clipping * pn / gn)
            return jnp.where(gn > clipping * pn, clipped, g)

        return jax.tree_util.tree_map(one, grads, params)

    return clip


def build_optimizer(
    optim_cfg: Dict[str, Any],
    learning_rate: Schedule = 0.0,
    wd_mask=None,
) -> optax.GradientTransformation:
    """Build from a config node like {_target_: sgd, momentum: 0.9, ...}.
    ``lr`` in the config is ignored (the reference always starts at 0 and lets
    PhasesScheduler drive it, train.py:91-92); pass the schedule here."""
    cfg = dict(optim_cfg)
    target = str(cfg.pop("_target_", "sgd"))
    name = _OPTIM_ALIASES.get(target, target if target in _BUILDERS else target.rsplit(".", 1)[-1].lower())
    if name not in _BUILDERS:
        raise KeyError(f"unknown optimizer {target!r}; known: {sorted(_BUILDERS)}")
    cfg.pop("lr", None)
    if "betas" in cfg:
        cfg["betas"] = tuple(cfg["betas"])
    use_lookahead = bool(cfg.pop("lookahead", False))
    la_k = int(cfg.pop("lookahead_k", 5))
    la_alpha = float(cfg.pop("lookahead_alpha", 0.5))
    tx = _BUILDERS[name](learning_rate, wd_mask=wd_mask, **cfg)
    if use_lookahead:
        tx = lookahead(tx, k=la_k, alpha=la_alpha)
    return tx
