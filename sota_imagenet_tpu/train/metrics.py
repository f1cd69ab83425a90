"""Metrics + host-side meters (pt.metrics.Accuracy / loss meters equivalent,
reference train.py:130,177-179)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def accuracy_topk(logits: jnp.ndarray, target: jnp.ndarray, k: int = 1, mean: bool = True) -> jnp.ndarray:
    """Fraction of samples whose target class is in the top-k logits.
    Soft/mixed targets reduce via argmax (reference Accuracy on one-hot).
    mean=False returns the per-sample 0/100 vector (masked rect-val path)."""
    labels = target if target.ndim == 1 else jnp.argmax(target, axis=-1)
    k = min(k, logits.shape[-1])  # Acc@5 on <5-class toy problems
    if k == 1:
        hit = jnp.argmax(logits, axis=-1) == labels
    else:
        _, topk = jax.lax.top_k(logits, k)
        hit = jnp.any(topk == labels[:, None], axis=-1)
    per_sample = hit.astype(jnp.float32) * 100.0
    return jnp.mean(per_sample) if mean else per_sample


def classification_metrics(logits: jnp.ndarray, target: jnp.ndarray, loss: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return {
        "loss": loss.astype(jnp.float32),
        "Acc@1": accuracy_topk(logits, target, 1),
        "Acc@5": accuracy_topk(logits, target, 5),
    }


class AverageMeter:
    """Running average over batches (reference loss_meter/metric_meters)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __repr__(self):
        return f"{self.name}: {self.avg:.4f}"


class MeterDict:
    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def update(self, metrics: Dict[str, float], n: int = 1):
        for k, v in metrics.items():
            self.meters.setdefault(k, AverageMeter(k)).update(float(v), n)

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def avg(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def __getitem__(self, k):
        return self.meters[k]

    def __contains__(self, k):
        return k in self.meters
