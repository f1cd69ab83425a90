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

from sota_imagenet_tpu.utils.dtypes import at_least_f32


def _as_soft_targets(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    if target.ndim == 1 or (target.ndim > 1 and target.shape[-1] != num_classes):
        return jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=jnp.float32)
    return at_least_f32(target)


class CrossEntropyLoss(Loss):
    """CE with label smoothing + optional temperature
    (pytorch_tools.losses.smooth.CrossEntropyLoss).

    ``normalize`` L2-normalizes the logit vector per sample before the
    (tempered) softmax — the legacy "normalize in CCE" flag
    (_old_configs exp86.BNet_norm / exp88.BNet_norm_temp, a NormSoftmax-style
    cosine criterion with the normalization on the criterion side)."""

    def __init__(
        self,
        smoothing: float = 0.0,
        temperature: Optional[float] = None,
        normalize: bool = False,
        reduction: str = "mean",
    ):
        self.smoothing = smoothing
        self.temperature = temperature
        self.normalize = normalize
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = at_least_f32(logits)
        if self.normalize:
            logits = logits / jnp.maximum(jnp.linalg.norm(logits, axis=-1, keepdims=True), 1e-12)
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
        logits = at_least_f32(logits)
        soft = _as_soft_targets(target, logits.shape[-1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        focal = (1.0 - p) ** self.gamma * logp
        if self.alpha is not None:
            focal = self.alpha * focal
        per_sample = -jnp.sum(soft * focal, axis=-1)
        return _reduce(per_sample, self.reduction)


class BinaryFocalLoss(Loss):
    """Sigmoid (binary, per-class) focal loss over one-hot targets — the legacy
    ``criterion: focal`` / ``a-focal`` (exp68-72, exp91; pytorch_tools
    FocalLoss in its default binary mode).

    * ``alpha`` < 0 disables alpha-weighting (legacy ``alpha: -1``); otherwise
      the positive class is weighted ``alpha``, negatives ``1-alpha``.
    * ``combine_thr`` > 0 switches to Reduced Focal Loss (arXiv:1903.01347):
      plain BCE while p_t < thr, focal factor ``((1-p_t)/(1-thr))^gamma`` above.
    * ``temperature`` scales logits first — the 'a-focal' angular variant
      (sphere-head cosine logits / 0.2, exp91.BNet_afocal_ctmx.yaml).
    """

    def __init__(
        self,
        gamma: float = 2.0,
        alpha: float = -1.0,
        combine_thr: float = 0.0,
        temperature: Optional[float] = None,
        smoothing: float = 0.0,
        reduction: str = "mean",
    ):
        self.gamma = gamma
        self.alpha = alpha
        self.combine_thr = combine_thr
        self.temperature = temperature
        self.smoothing = smoothing
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = at_least_f32(logits)
        if self.temperature is not None:
            logits = logits / self.temperature
        t = _as_soft_targets(target, logits.shape[-1])
        if self.smoothing > 0:
            t = t * (1.0 - self.smoothing) + self.smoothing / logits.shape[-1]
        bce = -(t * jax.nn.log_sigmoid(logits) + (1 - t) * jax.nn.log_sigmoid(-logits))
        p = jax.nn.sigmoid(logits)
        p_t = p * t + (1 - p) * (1 - t)
        if self.combine_thr > 0:
            focal = jnp.where(
                p_t < self.combine_thr,
                1.0,
                ((1.0 - p_t) / (1.0 - self.combine_thr)) ** self.gamma,
            )
        else:
            focal = (1.0 - p_t) ** self.gamma
        loss = focal * bce
        if self.alpha >= 0:
            loss = (self.alpha * t + (1 - self.alpha) * (1 - t)) * loss
        per_sample = jnp.sum(loss, axis=-1)
        return _reduce(per_sample, self.reduction)


class BinaryKLDivLoss(Loss):
    """Per-class binary KL divergence between sigmoid(logits) and soft targets
    (pytorch_tools.losses.BinaryKLDivLoss; used by FixMatchLoss, reference
    utils.py:55-77). ``smoothing`` smooths the one-hot targets first (legacy
    ``criterion: kld`` + ``smoothing: 0.01``, exp76.BNet_small_kld_nov_smooth)."""

    def __init__(self, reduction: str = "mean", eps: float = 1e-7, smoothing: float = 0.0):
        self.reduction = reduction
        self.eps = eps
        self.smoothing = smoothing

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = at_least_f32(logits)
        t = _as_soft_targets(target, logits.shape[-1])
        if self.smoothing > 0:
            t = t * (1.0 - self.smoothing) + self.smoothing / logits.shape[-1]
        t = jnp.clip(at_least_f32(t), self.eps, 1.0 - self.eps)
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
        logits = at_least_f32(logits)
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
