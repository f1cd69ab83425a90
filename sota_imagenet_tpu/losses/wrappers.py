"""Loss wrappers (reference utils.py:7-77)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sota_imagenet_tpu.losses.base import Loss
from sota_imagenet_tpu.losses.smooth import BinaryKLDivLoss

from sota_imagenet_tpu.utils.dtypes import at_least_f32


class HardNegativeWrapper(Loss):
    """Per-sample top-k% hard-negative mining over a reduction='none' loss
    (reference utils.py:7-26): take the hardest `hard_pct` of per-class losses
    for each sample, mean them."""

    def __init__(self, loss: Loss, hard_pct: float = 0.02):
        self.loss = loss
        self.hard_pct = hard_pct

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        raw = self.loss(y_pred, y_true)  # (B, C)
        k = max(int(self.hard_pct * raw.shape[1]), 1)
        hard, _ = jax.lax.top_k(raw, k)
        return jnp.mean(hard)


class FixMatchLoss(Loss):
    """Semi-supervised consistency loss (reference utils.py:55-77): first half
    of the batch is pulled toward the detached sigmoid predictions of the
    second half (soft KL) plus a weighted hard loss vs. the second half's
    labels; both take top-k over classes. All math in float32."""

    def __init__(self, hard_weight: float = 0.01, hard_pct: float = 0.01):
        self.criterion = BinaryKLDivLoss(reduction="none")
        self.hard_weight = hard_weight
        self.hard_pct = hard_pct

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        y_pred = at_least_f32(y_pred)
        half = y_pred.shape[0] // 2
        if y_true.ndim == 1:
            y_true = jax.nn.one_hot(y_true.astype(jnp.int32), y_pred.shape[-1], dtype=jnp.float32)
        raw_soft = self.criterion(y_pred[:half], jax.lax.stop_gradient(jax.nn.sigmoid(y_pred[half:])))
        raw_hard = self.criterion(y_pred[:half], y_true[half:])
        k = max(int(self.hard_pct * y_pred.shape[-1]), 1)
        soft = jnp.mean(jax.lax.top_k(raw_soft, k)[0])
        hard = jnp.mean(jax.lax.top_k(raw_hard, k)[0])
        return soft + self.hard_weight * hard
