"""Functional training state (replaces Runner-held mutable model/optimizer
state, reference train.py:145-152)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # global optimizer step
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None  # EMA of params (+ batch_stats snapshot at save)
    ema_batch_stats: Optional[Any] = None
    loss_state: Optional[Any] = None  # running stats of stateful criteria (e.g. AdaCos)
