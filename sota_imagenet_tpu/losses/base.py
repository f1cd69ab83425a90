"""Loss base class with arithmetic (pytorch_tools.losses.Loss equivalent).

The reference's auxiliary-loss callbacks rebuild the criterion as
``criterion + aux_loss * weight`` (reference callbacks.py:200-203); supporting
``+`` and ``*`` on loss objects keeps that pattern.
"""

from __future__ import annotations

import jax.numpy as jnp


class Loss:
    def __call__(self, *args, **kwargs) -> jnp.ndarray:  # pragma: no cover - interface
        raise NotImplementedError

    def __add__(self, other: "Loss") -> "Loss":
        return SumLoss(self, other)

    def __mul__(self, w: float) -> "Loss":
        return WeightedLoss(self, w)

    __rmul__ = __mul__


class SumLoss(Loss):
    def __init__(self, a: Loss, b: Loss):
        self.a, self.b = a, b

    def __call__(self, *args, **kwargs):
        return self.a(*args, **kwargs) + self.b(*args, **kwargs)


class WeightedLoss(Loss):
    def __init__(self, loss: Loss, weight: float):
        self.loss, self.weight = loss, weight

    def __call__(self, *args, **kwargs):
        return self.loss(*args, **kwargs) * self.weight


class StatefulLoss(Loss):
    """A loss with running statistics (e.g. AdaCos's running B/θ, reference
    angular_losses.py:301-314). State is an explicit pytree threaded through
    the jitted train step (TrainState.loss_state) — the JAX version of the
    reference's mutable buffers."""

    def init_state(self):
        return {}

    def __call__(self, logits, target, state=None):  # -> (loss, new_state)
        raise NotImplementedError


def call_criterion(criterion, logits, target, state=None):
    """Uniform invocation for stateful and stateless losses."""
    if isinstance(criterion, StatefulLoss):
        return criterion(logits, target, state)
    return criterion(logits, target), state


class FnLoss(Loss):
    """Wrap a plain callable (e.g. lambda over model params) as a Loss."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)
