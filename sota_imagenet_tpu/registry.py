"""Component registry: maps string names to Python callables.

The reference framework instantiates models/optimizers/criteria/callbacks from
config by dotted target path (hydra's ``_target_`` convention, see reference
train.py:64,81,92,143). We keep the convention but resolve through an explicit
registry first — no ``eval()`` (the reference CModel eval's config strings,
reference model.py:1199) — falling back to a plain module import for
fully-qualified paths.

Registered names are case-sensitive. Aliases let configs written against the
reference keep working (e.g. ``pytorch_tools.models.resnet50`` →
``sota_imagenet_tpu.models.resnet50``).
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, Callable] = {}
_ALIASES: Dict[str, str] = {}


def register(name: Optional[str] = None, *, aliases: tuple = ()):
    """Decorator: register a callable under ``name`` (defaults to __name__)."""

    def deco(fn: Callable) -> Callable:
        key = name or fn.__name__
        if key in _REGISTRY and _REGISTRY[key] is not fn:
            raise ValueError(f"duplicate registry entry: {key!r}")
        _REGISTRY[key] = fn
        for a in aliases:
            _ALIASES[a] = key
        return fn

    return deco


def register_alias(alias: str, target: str) -> None:
    _ALIASES[alias] = target


def resolve(target: str) -> Callable:
    """Resolve a target string to a callable.

    Resolution order:
      1. exact registry name,
      2. alias table,
      3. last dotted component as a registry name,
      4. ``module.attr`` import of a fully-qualified path.
    """
    # Make sure all registering modules have run.
    _populate()
    if target in _REGISTRY:
        return _REGISTRY[target]
    if target in _ALIASES:
        return _REGISTRY[_ALIASES[target]]
    tail = target.rsplit(".", 1)[-1]
    if tail in _REGISTRY:
        return _REGISTRY[tail]
    if tail in _ALIASES:
        return _REGISTRY[_ALIASES[tail]]
    if "." in target:
        module_name, attr = target.rsplit(".", 1)
        try:
            module = importlib.import_module(module_name)
        except ImportError as e:
            raise KeyError(f"cannot resolve target {target!r}: {e}") from e
        try:
            return getattr(module, attr)
        except AttributeError as e:
            raise KeyError(f"module {module_name!r} has no attribute {attr!r}") from e
    raise KeyError(f"unknown target {target!r}; known: {sorted(_REGISTRY)[:20]}...")


def names() -> list:
    _populate()
    return sorted(_REGISTRY)


_POPULATED = False


def _populate() -> None:
    """Import all modules that register components (idempotent)."""
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    for mod in (
        "sota_imagenet_tpu.models",
        "sota_imagenet_tpu.losses",
        "sota_imagenet_tpu.optim",
        "sota_imagenet_tpu.train.callbacks",
    ):
        try:
            importlib.import_module(mod)
        except ImportError:
            _POPULATED = False
            raise
