"""Orbax checkpointing (replaces torch.save/load, reference train.py:98-109,
134, 183-184; SURVEY.md §5.4).

Checkpoint payload: {state: TrainState pytree, epoch, stage} — the EMA params
live inside TrainState, so the reference's CheckpointSaver/ModelEma ordering
dance (train.py:133-135) disappears. Saves are async (orbax) so the step loop
never blocks on IO.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from sota_imagenet_tpu.train.state import TrainState
from sota_imagenet_tpu.utils.logging import get_logger


def _ckptr() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, state: TrainState, epoch: int, name: str = "model.ckpt") -> str:
    """Save (overwrites previous `name` — matches the reference's single
    rolling model.chpn)."""
    path = os.path.join(os.path.abspath(directory), name)
    payload = {"state": state, "epoch": np.asarray(epoch, np.int32)}
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state_template: TrainState) -> Tuple[TrainState, int]:
    """Restore; tolerates optimizer-state mismatch like the reference's
    best-effort optimizer load (train.py:105-109): on mismatch, restores
    params/batch_stats only and keeps the fresh optimizer state."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    template = {"state": state_template, "epoch": np.asarray(0, np.int32)}
    try:
        payload = ckptr.restore(path, target=template)
        return payload["state"], int(payload["epoch"])
    except Exception as e:  # optimizer changed — partial restore
        get_logger().info(f"Full checkpoint restore failed ({type(e).__name__}); retrying params-only")
        raw = ocp.PyTreeCheckpointer().restore(path)
        st = state_template
        st = st.replace(
            params=jax.tree_util.tree_map(lambda t, v: np.asarray(v, t.dtype), st.params, raw["state"]["params"]),
            batch_stats=jax.tree_util.tree_map(
                lambda t, v: np.asarray(v, t.dtype), st.batch_stats, raw["state"]["batch_stats"]
            ),
        )
        return st, int(raw.get("epoch", 0))
