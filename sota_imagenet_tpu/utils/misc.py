"""Small utilities (equivalents of pytorch_tools.utils.misc used by the
reference at train.py:56,71,76,84,96)."""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _machine_cache_key() -> str:
    """Short fingerprint of this host's CPU features. XLA:CPU persists AOT
    executables whose machine features must match the executing host; a cache
    dir shared across heterogeneous hosts (e.g. via a synced $HOME) feeds
    back entries that at best fail to load and at worst SIGILL (observed:
    round-3 gate tail full of cpu_aot_loader.cc machine-feature-mismatch
    errors). Scoping the path per machine keeps the cache useful AND safe."""
    import hashlib
    import platform

    feats = model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not feats and line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                # model name too: LLVM picks TUNING features (e.g.
                # prefer-no-scatter) from the CPU model — two hosts with
                # identical ISA flags can still produce incompatible AOT
                # entries (observed round 4: mismatch errors inside a
                # flags-keyed dir)
                if not model and line.startswith(("model name", "CPU part")):
                    model = line.split(":", 1)[1].strip()
                if feats and model:
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{model}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent on-disk compilation cache (XLA executables keyed by HLO +
    compile options). On this environment TPU compiles go through a remote
    compile service that can queue for many minutes (CLAUDE.md); caching the
    compiled executable locally makes repeat runs of the same program
    (bench.py, the soak's relaunch) immune to that queue. The directory is
    scoped by a machine-feature fingerprint (see _machine_cache_key) so
    XLA:CPU AOT entries never cross heterogeneous hosts. Safe no-op if the
    backend doesn't support serialization."""
    import os

    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU's AOT loader rejects its OWN entries on this host: it
            # stamps executables with tuning pseudo-features
            # (+prefer-no-gather/+prefer-no-scatter) that host feature
            # detection never reports, so every load logs a machine-feature-
            # mismatch error and falls back to a fresh compile (observed on
            # the round-3/4 gates). The cache's purpose is dodging the REMOTE
            # TPU compile queue; on the CPU backend it is all spam, no hits.
            return
    except Exception:
        pass
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser("~/.cache/jax_comp_cache")
    path = os.path.join(path, _machine_cache_key())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, even fast compiles: the cost here is queue latency,
        # not compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unknown config name on an older jax — never fatal
        pass


def set_random_seed(seed: int) -> None:
    """Seed host RNGs (reference pt.utils.misc.set_random_seed, train.py:56).
    Device randomness is functional in JAX: pass jax.random keys explicitly."""
    random.seed(seed)
    np.random.seed(seed % (2**32))


def host_prng_key(seed: int, *folds: int) -> np.ndarray:
    """PRNGKey built ON THE HOST cpu backend, returned as numpy.

    Two properties matter:
    * creating/deriving it never touches the accelerator — on a tunneled
      TPU even an 8-byte D2H readback costs a ~30 ms round trip and flips
      the transfer stream's mode (PERF.md round 4), and on real TPU VMs
      readbacks serialize dispatch; per-batch key derivation (DeviceFeed)
      must stay host-side;
    * numpy is an *uncommitted* argument — it composes with any jit
      sharding and ships with the dispatch (8 bytes).
    """
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # no cpu backend registered (never on current jax)
        cpu0 = None
    with jax.default_device(cpu0):
        key = jax.random.PRNGKey(seed)
        for f in folds:
            key = jax.random.fold_in(key, f)
        return np.asarray(key)


def listify(x: Any) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def count_parameters(params) -> int:
    """Total number of trainable scalars in a params pytree (reference
    train.py:96 logs this in millions)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def param_path_strings(params) -> List[str]:
    """Flattened '/'-joined key paths for every leaf of a params pytree."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return ["/".join(_key_str(k) for k in path) for path, _ in flat]


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def filter_from_weight_decay(params, skip_list: Sequence[str]) -> Any:
    """Boolean mask pytree: True = apply weight decay.

    Reference semantics (pytorch_tools filter_from_weight_decay, used at
    train.py:83-84 with e.g. ``filter_from_wd: [gain]``): a parameter is
    excluded from decay if it has ndim <= 1 (biases, norm scales) or its name
    contains any of ``skip_list`` as a substring.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask = []
    for path, leaf in flat:
        name = "/".join(_key_str(k) for k in path).lower()
        skip = leaf.ndim <= 1 or any(s.lower() in name for s in skip_list)
        mask.append(not skip)
    return jax.tree_util.tree_unflatten(treedef, mask)


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def apply_sigmoid_trick(params, num_classes: int | None = None):
    """Set the classifier bias to ``-log(C-1)`` so the initial sigmoid
    probability of each class is ~1/C — the RetinaNet focal prior
    (arXiv:1708.02002 §4.1). This is the legacy flat-schema
    ``sigmoid_trick: true`` (exp66-81, used with sigmoid/kld/focal criteria).

    The classifier is found as every ``.../fc/bias`` leaf (all repo model
    families name their classifier ``fc``); if none exists (e.g. a CModel
    whose head is a plain ``nn.Linear`` layer), the LAST 1-d bias of width
    ``num_classes`` in tree order is used instead."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    hits = [p for p, leaf in flat.items() if len(p) >= 2 and p[-2:] == ("fc", "bias") and getattr(leaf, "ndim", 0) == 1]
    if not hits and num_classes is not None:
        cands = [
            p
            for p, leaf in flat.items()
            if p[-1] == "bias" and getattr(leaf, "ndim", 0) == 1 and leaf.shape[0] == num_classes
        ]
        hits = cands[-1:]
    if not hits:
        raise ValueError(
            "sigmoid_trick: no fc/bias leaf found in params (classifier must be "
            "named 'fc' with a bias, or pass num_classes for the fallback)"
        )
    for path in hits:
        leaf = flat[path]
        c = leaf.shape[0]
        flat[path] = jnp.full_like(leaf, -float(np.log(max(c - 1, 1))))
    return flax.traverse_util.unflatten_dict(flat)
