"""Optimizer factory: config dict → optax GradientTransformation.

Replaces the reference's optimizer instantiation (train.py:92) and its fused
`torch._foreach_*` / apex paths — under jit, optax's tree-mapped updates fuse
into a handful of XLA kernels, so "fused multi-tensor" comes for free
(SURVEY.md §2.3).

Weight-decay filtering: the reference builds two param groups via
``filter_from_weight_decay`` (train.py:83-89) — params with ndim<=1 or names
matching ``filter_from_wd`` substrings get wd=0. Here that is an optax mask
produced by utils.misc.filter_from_weight_decay.

Semantics preserved per optimizer:
  * sgd — torch-style *coupled* L2 (grad += wd·param before momentum);
  * adamw — decoupled weight decay (pytorch_tools.optim.adamw.AdamW).

IMPORTANT: builders return the transform WITHOUT the final -lr scaling. The
jitted train step multiplies updates by -lr(step) itself, so the phase
scheduler (train/schedule.py) can be rebuilt across progressive-resize stages
without re-initializing optimizer state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]

_BUILDERS: Dict[str, Callable[..., optax.GradientTransformation]] = {}

_OPTIM_ALIASES = {
    "torch.optim._multi_tensor.SGD": "sgd",
    "torch.optim.SGD": "sgd",
    "pytorch_tools.optim.adamw.AdamW": "adamw",
    "torch.optim.AdamW": "adamw",
    "badam.BAdam": "badam",
    "adamp.AdamP": "adamp",
    "apex.optimizers.FusedNovoGrad": "novograd",
    "src.optimizers.MyNovograd": "novograd",
    "src.optimizers.NovogradApex": "novograd_apex",
    "src.optimizers.AdamLayerwise": "adam_layerwise",
    "src.optimizers.MyAdai": "adai",
    "src.optimizers.AdaiS": "adais",
    "src.optimizers.MADGRAD": "madgrad",
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
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    dampening: float = 0.0,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(_mask_wd(optax.add_decayed_weights(weight_decay), wd_mask))
    if momentum:
        # torch momentum buffer: b = m·b + g ; update uses b (or g + m·b nesterov)
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    if not parts:
        parts.append(optax.identity())
    return optax.chain(*parts)


@register_optimizer("adamw")
def adamw(
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        _mask_wd(optax.add_decayed_weights(weight_decay), wd_mask) if weight_decay else optax.identity(),
    )


@register_optimizer("lamb")
def lamb(
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
    )


def build_optimizer(
    optim_cfg: Dict[str, Any],
    wd_mask=None,
) -> optax.GradientTransformation:
    """Build from a config node like {_target_: sgd, momentum: 0.9, ...}.
    ``lr`` in the config is ignored (the reference also always starts at 0 and
    lets PhasesScheduler drive it, train.py:91-92); the train step applies
    -lr(step)."""
    cfg = dict(optim_cfg)
    target = str(cfg.pop("_target_", "sgd"))
    name = _OPTIM_ALIASES.get(target, target if target in _BUILDERS else target.rsplit(".", 1)[-1].lower())
    if name not in _BUILDERS:
        raise KeyError(f"unknown optimizer {target!r}; known: {sorted(_BUILDERS)}")
    cfg.pop("lr", None)
    if "betas" in cfg:
        cfg["betas"] = tuple(cfg["betas"])
    return _BUILDERS[name](wd_mask=wd_mask, **cfg)
