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


def create_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None, spatial: int = 1
) -> Mesh:
    """3-axis mesh ("data", "spatial", "model").

    'data' carries batch parallelism (the reference's only strategy,
    SURVEY.md §2.4). 'spatial' shards the image HEIGHT dimension of model
    compute — the CNN analog of sequence parallelism; XLA's SPMD partitioner
    inserts the conv halo exchanges automatically (see spatial docstring on
    image_sharding). 'model' exists for head/optimizer-state sharding
    experiments. Consecutive devices land on the same 'data' row, so on a
    multi-host pod the spatial axis stays intra-host/ICI-local.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (model * spatial):
            raise ValueError(f"{n} devices not divisible by spatial*model={spatial * model}")
        data = n // (model * spatial)
    if data * spatial * model != n:
        raise ValueError(f"mesh {data}x{spatial}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, spatial, model)
    return Mesh(arr, axis_names=("data", "spatial", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Sharding for NHWC model inputs: batch over 'data', H over 'spatial'.

    Returns None when the mesh has no spatial axis (or it is size 1) — the
    pure-DP fast path. With spatial > 1 every conv/pool over a sharded H is
    partitioned by XLA GSPMD with automatic halo exchange; BN statistics stay
    exact because reductions over a global array are global by construction.
    This is the TPU-native way to fit larger images / activation footprints
    than one chip's HBM allows (progressive-resize tail stages, full-crop
    val) — no reference analog (DDP cannot split one sample across GPUs).

    CONSTRAINT (validate_spatial_extent): the deepest feature map must keep
    >= 2 rows per spatial shard. Measured on jax 0.8 CPU SPMD: when the
    deepest stage's shards fall below the 3x3 halo (1-row or fractional-row
    shards), the FORWARD stays exact but conv weight gradients come back
    scaled by exactly the data-axis size (x4 on a 4x2 mesh, x2 on 2x4) —
    a wrong-collective miscompilation, isolated in tests/test_spatial.py's
    guard note. At >= 2 rows/shard everything is exact to f64 noise
    (~1e-13, full ResNet-50).
    """
    if "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return None


def validate_spatial_extent(mesh: Mesh, image_size: int, max_stride: int = 32) -> None:
    """Refuse spatial partitioning that would shard the deepest feature map
    (image_size / max_stride rows) below 2 rows per device — the regime where
    XLA SPMD miscompiles conv wgrad (see image_sharding docstring)."""
    sp = dict(mesh.shape).get("spatial", 1)
    if sp <= 1:
        return
    deepest = max(int(image_size) // int(max_stride), 1)
    if deepest // sp < 2:
        raise ValueError(
            f"mesh.spatial={sp} leaves {deepest}/{sp} < 2 rows per shard at the deepest "
            f"feature map (image {image_size}, max stride {max_stride}); XLA SPMD "
            f"miscompiles conv gradients below the halo width — use image_size >= "
            f"{2 * sp * max_stride} or a smaller spatial axis"
        )


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


_TP_DEFAULT_PATTERNS = ("fc", "head", "classifier")


def tp_sharding(mesh: Mesh, tree: Any, patterns: Optional[Sequence[str]] = None) -> Any:
    """Class-partitioned (vocab-parallel) head TP spec tree over 'model'.

    Leaves whose tree path matches one of ``patterns`` get their LAST
    dimension sharded over the 'model' axis: a head kernel (in, C) becomes
    column-parallel and its bias (C,) class-sharded. Under global-view jit
    each device then computes only its logit class-shard; softmax/CE
    reductions over classes lower to psums over 'model' inserted by XLA —
    no manual collectives. This is the one TP axis that matters for this
    model family: metric-learning heads (losses/angular.py) scale to
    millions of identities, where the classifier dominates memory. The
    reference (pure DDP) replicates the head. Non-matching leaves (and
    matching ones whose last dim is not divisible) stay replicated.
    """
    pats = tuple(p.lower() for p in (patterns or _TP_DEFAULT_PATTERNS))
    n = mesh.shape["model"]

    def matches(path) -> bool:
        # A pattern must name a path COMPONENT (or an underscore-token of one,
        # with an optional numeric suffix: fc / fc1 / head_fc2). Substring
        # matching would also hit unrelated params (e.g. 'fconv3' for 'fc')
        # and class-shard hot conv kernels over the model axis.
        import re

        for entry in path:
            key = getattr(entry, "key", getattr(entry, "name", None))
            if not isinstance(key, str):
                continue
            for tok in re.split(r"[^0-9a-z]+", key.lower()):
                for p in pats:
                    if tok == p or (tok.startswith(p) and tok[len(p) :].isdigit()):
                        return True
        return False

    def spec(path, leaf):
        shape = getattr(leaf, "shape", ())
        if n > 1 and shape and shape[-1] % n == 0 and matches(path):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def apply_head_tp(state: Any, mesh: Mesh, patterns: Optional[Sequence[str]] = None) -> Any:
    """Place a TrainState with head-TP shardings on params, EMA params and the
    optimizer state (optax moment trees mirror param paths, so the head's
    moments distribute with it). Semantics unchanged — tests/test_tp.py
    asserts sharded == single-device.

    Only pattern-MATCHED leaves are re-placed; everything else keeps its
    current placement, so composing with ZeRO-1 (apply_zero1 first, then
    this) preserves the data-axis opt-state shards instead of silently
    re-replicating them."""
    empty = P()

    def put(tree):
        if tree is None:
            return None
        sh = tp_sharding(mesh, tree, patterns)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if s.spec != empty else x, tree, sh
        )

    return state.replace(
        params=put(state.params),
        ema_params=put(state.ema_params),
        opt_state=put(state.opt_state),
    )
