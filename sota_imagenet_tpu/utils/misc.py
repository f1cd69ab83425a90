"""Small utilities (equivalents of pytorch_tools.utils.misc used by the
reference at train.py:56,71,76,84,96)."""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed host RNGs (reference pt.utils.misc.set_random_seed, train.py:56).
    Device randomness is functional in JAX: pass jax.random keys explicitly."""
    random.seed(seed)
    np.random.seed(seed % (2**32))


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
