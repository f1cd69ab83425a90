"""Dtype helpers for the fp32-island convention.

The reference keeps loss/statistics numerics in fp32 under AMP (reference
utils.py:69 autocast(enabled=False); BN stats accumulate fp32 under AMP).
On TPU the equivalent islands must FLOOR precision at float32 — promote
bf16/fp16 up — but never CAP it: in float64 mode (jax_enable_x64, used by
the equality gates and the trajectory-parity tests) a hard
``astype(float32)`` would silently downcast and turn benign partition
reduction-order noise into f32-ulp divergence (measured in
__graft_entry__.dryrun_multichip with spatial partitioning).
"""

from __future__ import annotations

import jax.numpy as jnp


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Cast to float32 if lower-precision; keep float64 (and complex) intact."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
