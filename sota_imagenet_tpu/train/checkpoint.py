"""Orbax checkpointing (replaces torch.save/load, reference train.py:98-109,
134, 183-184; SURVEY.md §5.4).

Checkpoint payload: {state: TrainState pytree, epoch} — the EMA params live
inside TrainState, so the reference's CheckpointSaver/ModelEma ordering dance
(train.py:133-135) disappears.

Durability + concurrency model:
  * saves are ASYNC (ocp.AsyncCheckpointer): the device→host copy is
    synchronous, the disk write happens on a background thread, so the epoch
    loop is not blocked on IO;
  * saves are ATOMIC and never destroy the previous checkpoint before the new
    one is complete: each save writes to ``<name>.new-*`` (orbax itself stages
    into a tmp dir and renames on commit), and the swap into ``<name>`` happens
    on the next save / at finalize. A crash at ANY point leaves either the old
    or the new complete checkpoint on disk;
  * multiprocess: orbax saves are COLLECTIVE — every process must call
    save/finalize (shard owners write once; there is a cross-process barrier in
    wait_until_finished). Do NOT master-gate the calls; only the directory
    renames are done by process 0 here, mirroring the reference's
    rank_zero_only file writes (reference callbacks.py:11,20,30).
"""

from __future__ import annotations

import itertools
import os
import shutil
from typing import Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from sota_imagenet_tpu.train.state import TrainState
from sota_imagenet_tpu.utils.logging import get_logger

_CKPTR = None
_PENDING: Dict[str, str] = {}  # final path -> staged tmp path
_SEQ = itertools.count()


def _get_ckptr() -> "ocp.AsyncCheckpointer":
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _CKPTR


def _is_primary() -> bool:
    return jax.process_index() == 0


def finalize_checkpoints() -> None:
    """Wait for in-flight saves and commit them to their final names.

    Called automatically before every new save, before any load, and must be
    called at the end of training (Runner.close / CheckpointSaver.on_end do).
    Collective in multiprocess runs.
    """
    global _PENDING
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    if not _PENDING:
        return
    pending, _PENDING = _PENDING, {}
    if _is_primary():
        for final, tmp in pending.items():
            if not os.path.exists(tmp):  # save failed; keep the old checkpoint
                get_logger().warning(f"checkpoint stage {tmp} missing; keeping {final}")
                continue
            stale = final + ".stale"
            if os.path.exists(stale):
                shutil.rmtree(stale)
            if os.path.exists(final):
                os.rename(final, stale)
            os.rename(tmp, final)
            if os.path.exists(stale):
                shutil.rmtree(stale)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_swap")


def save_checkpoint(
    directory: str, state: TrainState, epoch: int, name: str = "model.ckpt", block: bool = False
) -> str:
    """Async, atomic save (overwrites previous `name` on commit — matches the
    reference's single rolling model.chpn). In multiprocess runs EVERY process
    must call this (orbax writes each shard once, from its replica-0 owner)."""
    path = os.path.join(os.path.abspath(directory), name)
    finalize_checkpoints()  # at most one save in flight

    # Materialize fully-addressable arrays to host numpy HERE, synchronously.
    # Handing device arrays to the AsyncCheckpointer lets its background
    # thread issue device work, and on backends where programs synchronize
    # through host-thread rendezvous (the virtual-CPU mesh) that work can
    # interleave with the next train step's collectives and deadlock it —
    # observed as a reproducible "collective permute ... 7 of 8 arrived"
    # abort at the first spatially-partitioned step after a save. Non-
    # addressable arrays (multi-host shards, e.g. ZeRO-1 on a pod) stay jax
    # arrays so orbax's collective save path still writes each shard once.
    def _to_host(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return np.asarray(x)
        return x

    payload = {"state": jax.tree_util.tree_map(_to_host, state), "epoch": np.asarray(epoch, np.int32)}
    tmp = f"{path}.new-{next(_SEQ)}"
    if _is_primary() and os.path.exists(tmp):  # leftover from a crashed run
        shutil.rmtree(tmp)
    _get_ckptr().save(tmp, payload)
    _PENDING[path] = tmp
    if block:
        finalize_checkpoints()
    return path


def load_checkpoint(path: str, state_template: TrainState) -> Tuple[TrainState, int]:
    """Restore; tolerates optimizer-state mismatch like the reference's
    best-effort optimizer load (train.py:105-109): on mismatch, restores
    params/batch_stats only and keeps the fresh optimizer state."""
    finalize_checkpoints()  # commit anything staged for this path first
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"state": state_template, "epoch": np.asarray(0, np.int32)}
    try:
        payload = ckptr.restore(path, target=template)
        return payload["state"], int(payload["epoch"])
    except Exception as e:  # optimizer changed — partial restore
        raw = ocp.PyTreeCheckpointer().restore(path)
        if raw["state"].get("opt_state") is None:
            # expected: saved with log.save_optim=false (reference default —
            # "makes it 2x larger"), so there is no optimizer state on disk
            get_logger().info("Checkpoint has no optimizer state (log.save_optim=false); restoring params/batch_stats")
        else:
            get_logger().info(f"Full checkpoint restore failed ({type(e).__name__}); retrying params-only")
        st = state_template

        def _restore_field(name, required):
            """Take the on-disk value when present. params/batch_stats are
            REQUIRED: a structure mismatch there means the checkpoint is for a
            different model and must fail loudly, not resume at epoch N with
            random weights. EMA copies / loss_state are best-effort.

            `step` is NOT restored here on purpose: the fresh optimizer
            state's schedule count restarts at 0, and the Runner anchors the
            lr schedule with base_step=state.step — step and count must stay
            consistent or the APPLIED lr silently replays from the wrong
            point (the resumed epoch is carried by base_epoch instead)."""
            tmpl = getattr(st, name)
            disk = raw["state"].get(name)
            if disk is None or tmpl is None:
                return tmpl
            try:
                return jax.tree_util.tree_map(lambda t, v: np.asarray(v, np.asarray(t).dtype), tmpl, disk)
            except Exception:
                if required:
                    raise
                get_logger().info(f"Partial restore: field {name!r} structure mismatch; keeping fresh value")
                return tmpl

        st = st.replace(
            params=_restore_field("params", required=True),
            batch_stats=_restore_field("batch_stats", required=True),
            ema_params=_restore_field("ema_params", required=False),
            ema_batch_stats=_restore_field("ema_batch_stats", required=False),
            loss_state=_restore_field("loss_state", required=False),
        )
        return st, int(raw.get("epoch", 0))
