"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP wiring (reference train.py:58-61,114;
SURVEY.md §5.8) the TPU way: one global jit program over a
``jax.sharding.Mesh``. The batch is sharded along the ``data`` axis; params
and optimizer state are replicated (the reference is pure DP; SURVEY.md §2.4).
XLA inserts the gradient all-reduce over ICI — there is no explicit psum in
user code because the batch is a *global* array and reductions over it are
global by construction (this also makes BatchNorm cross-replica).

The ``model`` axis exists for sharding the classifier head / optimizer state
if ever needed; size 1 by default.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def zero1_opt_sharding(mesh: Mesh, opt_state: Any) -> Any:
    """ZeRO-1 sharding spec tree for the optimizer state (mesh.zero1).

    Each state leaf (momentum, Adam moments, ...) is sharded over the 'data'
    axis along its LARGEST divisible dimension; leaves with no divisible dim
    (scalars, odd shapes) stay replicated. Params and gradients remain
    replicated — inside the jitted step XLA partitions the elementwise
    optimizer math per shard and gathers the applied updates, so per-chip
    optimizer-state memory drops ~n_data-fold (2x params' bytes for Adam
    moments) at the cost of one update-sized all-gather per step on ICI.
    This goes beyond the reference (pure DDP replicates everything,
    reference train.py:114); semantics are unchanged — tests/test_zero1.py
    asserts sharded == replicated bit-for-bit."""
    n = mesh.shape["data"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if n > 1 and shape:
            for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
                if shape[ax] and shape[ax] % n == 0:
                    parts = [None] * len(shape)
                    parts[ax] = "data"
                    return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, opt_state)


def apply_zero1(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState's opt_state with ZeRO-1 shardings (see above)."""
    sh = zero1_opt_sharding(mesh, state.opt_state)
    opt = jax.tree_util.tree_map(jax.device_put, state.opt_state, sh)
    return state.replace(opt_state=opt)
