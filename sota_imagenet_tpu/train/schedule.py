"""Phase-based LR scheduling (pytorch_tools PhasesScheduler equivalent).

The reference builds ``[{ep:(start,end), lr:(a,b), mode:linear|cos}]`` from
run.stages (train.py:121-126) and updates lr every batch. Here the phases
compile into a pure ``lr(step)`` function usable inside the jitted train step
via optax.scale_by_learning_rate.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp

from sota_imagenet_tpu.config import DataStage


def phases_from_stages(stages: Sequence[DataStage]) -> List[dict]:
    out = []
    for st in stages:
        if st.lr is None:
            continue
        # lr_ep: the phase's true epoch span when it extends past the stage
        # (legacy mid-phase data changes); consecutive stages cut from the
        # same phase produce identical entries — deduplicate them
        ep = tuple(st.lr_ep) if st.lr_ep is not None else (st.start, st.end)
        ph = dict(ep=ep, lr=tuple(st.lr), mode=st.lr_mode or "linear")
        if not out or out[-1] != ph:
            out.append(ph)
    return out


def make_lr_schedule(
    phases: Sequence[dict],
    steps_per_epoch: int,
    base_epoch: float = 0.0,
    base_step: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Piecewise linear/cosine schedule over *fractional epochs* (the reference
    interpolates per batch). Beyond the last phase, holds its final lr.

    ``base_epoch``/``base_step`` anchor the epoch<->step mapping so it stays
    correct across progressive-resize stages whose batch size (and therefore
    steps_per_epoch) differs: epoch = base_epoch + (step - base_step) / spe.
    """
    if not phases:
        return lambda step: jnp.asarray(0.0, jnp.float32)
    spans = []
    for ph in phases:
        (e0, e1) = ph["ep"]
        (a, b) = ph["lr"]
        spans.append((float(e0), float(e1), float(a), float(b), ph.get("mode", "linear")))

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        ep = float(base_epoch) + (jnp.asarray(step, jnp.float32) - float(base_step)) / float(steps_per_epoch)
        # phases are ordered; each takes over once ep >= its start, clamping t
        # to 1 keeps a finished phase at its end lr until the next one starts
        lr = jnp.asarray(spans[0][2], jnp.float32)
        for e0, e1, a, b, mode in spans:
            t = jnp.clip((ep - e0) / max(e1 - e0, 1e-9), 0.0, 1.0)
            if mode == "cos":
                val = b + (a - b) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
            elif mode == "poly":
                # quadratic decay between the endpoints — the legacy
                # EfficientNet recipe's approximation of TF's exponential
                # decay (effnetb0_tf.yaml "mode": "poly")
                val = b + (a - b) * (1.0 - t) ** 2
            else:
                val = a + (b - a) * t
            lr = jnp.where(ep >= e0, val, lr)
        return lr

    return schedule
