"""Classification losses (pytorch_tools.losses equivalents; SURVEY.md §2.2).

The default criterion is cross-entropy with label smoothing over one-hot
device labels (reference arg_parser.py:140-142 + dali one_hot,
dali_dataloader.py:123). Targets may be integer class ids, one-hot, or soft
(mixup/cutmix) distributions. Loss math runs in float32 (the reference keeps
fp32 islands for loss numerics, utils.py:69).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sota_imagenet_tpu.losses.base import Loss


def _as_soft_targets(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    if target.ndim == 1 or (target.ndim > 1 and target.shape[-1] != num_classes):
        return jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=jnp.float32)
    return target.astype(jnp.float32)


class CrossEntropyLoss(Loss):
    """CE with label smoothing + optional temperature
    (pytorch_tools.losses.smooth.CrossEntropyLoss)."""

    def __init__(self, smoothing: float = 0.0, temperature: Optional[float] = None, reduction: str = "mean"):
        self.smoothing = smoothing
        self.temperature = temperature
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = logits.astype(jnp.float32)
        if self.temperature is not None:
            logits = logits / self.temperature
        num_classes = logits.shape[-1]
        soft = _as_soft_targets(target, num_classes)
        if self.smoothing > 0:
            soft = soft * (1.0 - self.smoothing) + self.smoothing / num_classes
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = -jnp.sum(soft * logp, axis=-1)
        return _reduce(per_sample, self.reduction)


class FocalLoss(Loss):
    """Multiclass focal loss over soft targets (pytorch_tools.losses.FocalLoss)."""

    def __init__(self, gamma: float = 2.0, alpha: Optional[float] = None, reduction: str = "mean"):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = logits.astype(jnp.float32)
        soft = _as_soft_targets(target, logits.shape[-1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        focal = (1.0 - p) ** self.gamma * logp
        if self.alpha is not None:
            focal = self.alpha * focal
        per_sample = -jnp.sum(soft * focal, axis=-1)
        return _reduce(per_sample, self.reduction)


class BinaryKLDivLoss(Loss):
    """Per-class binary KL divergence between sigmoid(logits) and soft targets
    (pytorch_tools.losses.BinaryKLDivLoss; used by FixMatchLoss, reference
    utils.py:55-77)."""

    def __init__(self, reduction: str = "mean", eps: float = 1e-7):
        self.reduction = reduction
        self.eps = eps

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = logits.astype(jnp.float32)
        t = jnp.clip(target.astype(jnp.float32), self.eps, 1.0 - self.eps)
        p = jnp.clip(jax.nn.sigmoid(logits), self.eps, 1.0 - self.eps)
        kl = t * jnp.log(t / p) + (1.0 - t) * jnp.log((1.0 - t) / (1.0 - p))
        # 'none' keeps the (batch, classes) matrix — the hard-negative wrappers
        # top-k over the class dim (reference utils.py:25,72-75)
        return _reduce(kl, self.reduction)


class SigmoidLoss(Loss):
    """Binary CE over one-hot targets — the 'sigmoid' criterion tried by the
    BResNet encoder recipe (BResNet50_encoder.yaml:41)."""

    def __init__(self, smoothing: float = 0.0, reduction: str = "mean"):
        self.smoothing = smoothing
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = logits.astype(jnp.float32)
        soft = _as_soft_targets(target, logits.shape[-1])
        if self.smoothing > 0:
            soft = soft * (1.0 - self.smoothing) + self.smoothing / logits.shape[-1]
        per_class = -(soft * jax.nn.log_sigmoid(logits) + (1 - soft) * jax.nn.log_sigmoid(-logits))
        per_sample = jnp.sum(per_class, axis=-1)
        return _reduce(per_sample, self.reduction)


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "none":
        return x
    raise ValueError(f"unknown reduction {reduction!r}")
