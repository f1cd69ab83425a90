"""Experimental optimizer zoo (reference optimizers.py, SURVEY.md §2.1 #12)
as optax-style GradientTransformations.

Under jit these tree-mapped updates fuse into a handful of XLA kernels — the
TPU answer to the reference's ``torch._foreach_*`` fused loops
(optimizers.py:140-159) and apex FusedNovoGrad.

Conventions:
  * every builder takes ``learning_rate`` (float or schedule of the update
    count) because several reference optimizers couple lr into their decay
    (``p *= 1 - lr*wd``, MADGRAD's ``lamb = lr*sqrt(k+1)``);
  * updates returned are the full additive delta (apply with
    ``optax.apply_updates``), matching the reference update order exactly;
  * ``wd_mask`` leaf=True means decay applies (bias/gain filtering,
    reference train.py:83-89).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable]


def _lr_at(learning_rate: Schedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return jnp.asarray(learning_rate(count), jnp.float32)
    return jnp.asarray(learning_rate, jnp.float32)


def _tree_with_mask(params, mask):
    if mask is None:
        return jax.tree_util.tree_map(lambda _: True, params)
    return mask


def _unitwise_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Row-wise (output-dim-leading) L2 norm (reference optimizers.py:16-22).
    NOTE: torch weights are (out, ...) — flax conv kernels are HWIO with out
    LAST, dense kernels (in, out). We norm over all axes except the output
    axis, which is the last one here."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x) * jnp.ones_like(x)
    axes = tuple(range(x.ndim - 1))
    return jnp.broadcast_to(jnp.sqrt(jnp.sum(x**2, axis=axes, keepdims=True)), x.shape)


# --------------------------------------------------------------------------- #
# Novograd (reference MyNovograd/NovogradApex, optimizers.py:35-290)
# --------------------------------------------------------------------------- #


class NovogradState(NamedTuple):
    count: jnp.ndarray
    ema_grad: Any
    ema_norm: Any


def novograd(
    learning_rate: Schedule,
    betas=(0.95, 0.0),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    ema_norm_init: float = 1e-3,
    unitwise: bool = False,
    wd_eps: Optional[float] = None,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """Novograd (reference NovogradApex, optimizers.py:189-290):
    per-layer grad-norm second moment; first moment of grad/denom; decoupled
    multiplicative wd, or ``wd_eps`` dead-zone decay (|w|<=eps not decayed).
    The reference's MyNovograd accidentally norms *params* instead of grads
    (optimizers.py:135-138) — we implement the intended grad norm."""
    b1, b2 = betas

    def init(params):
        return NovogradState(
            count=jnp.zeros((), jnp.int32),
            ema_grad=jax.tree_util.tree_map(jnp.zeros_like, params),
            ema_norm=jax.tree_util.tree_map(lambda p: jnp.full((), ema_norm_init, jnp.float32), params),
        )

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)

        def norm_sq(g):
            if unitwise:
                return _unitwise_norm(g) ** 2  # broadcastable
            return jnp.sum(g.astype(jnp.float32) ** 2)

        new_norm = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * norm_sq(g), state.ema_norm, grads
        )
        new_m = jax.tree_util.tree_map(
            lambda m, g, v: b1 * m + (1 - b1) * g / (jnp.sqrt(v) + eps), state.ema_grad, grads, new_norm
        )

        def delta(p, m, decay_on):
            upd = -lr * m
            wd = weight_decay if decay_on else 0.0
            if wd == 0.0:
                return upd
            p_after = p + upd
            if wd_eps is None:
                return upd - lr * wd * p_after  # (p+upd)*(1-lr*wd) - p
            dead = jnp.sign(p_after) * jnp.clip(jnp.abs(p_after) - wd_eps, 0.0, None)
            return upd - lr * wd * dead

        updates = jax.tree_util.tree_map(delta, params, new_m, mask)
        return updates, NovogradState(state.count + 1, new_m, new_norm)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------- #
# AdamLayerwise (reference optimizers.py:293-397)
# --------------------------------------------------------------------------- #


class AdamLayerwiseState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


def adam_layerwise(
    learning_rate: Schedule,
    betas=(0.95, 0.0),
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    ema_norm_init: float = 1e-3,
    weight_adapt: bool = False,
    stable_wd: bool = False,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """Adam with *layer-wise* mean(g²) second moment; optional weight-RMS-
    adapted step and stable (denom-scaled) weight decay."""
    b1, b2 = betas

    def init(params):
        return AdamLayerwiseState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree_util.tree_map(lambda p: jnp.full((), ema_norm_init, jnp.float32), params),
        )

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.mean(g.astype(jnp.float32) ** 2), state.exp_avg_sq, grads
        )
        new_m = jax.tree_util.tree_map(
            lambda m, g, v: b1 * m + (1 - b1) * g / (jnp.sqrt(v) + eps), state.exp_avg, grads, new_v
        )

        def delta(p, m, v, decay_on):
            step = m
            if weight_adapt:
                rms = jnp.clip(jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2)), 1e-3, None)
                step = step * rms
            upd = -lr * step
            wd = weight_decay if decay_on else 0.0
            if wd == 0.0:
                return upd
            denom = jnp.sqrt(v) + eps
            factor = (lr * wd / denom) if stable_wd else (lr * wd)
            return upd - factor * (p + upd)

        updates = jax.tree_util.tree_map(delta, params, new_m, new_v, mask)
        return updates, AdamLayerwiseState(state.count + 1, new_m, new_v)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------- #
# Adai (reference MyAdai, optimizers.py:400-519) + AdaiS (:522-641)
# --------------------------------------------------------------------------- #


class AdaiState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


def adai(
    learning_rate: Schedule,
    betas=(0.1, 0.99),
    eps: float = 1e-3,
    weight_decay: float = 0.0,
    ema_norm_init: float = 1e-3,
    sgd_mom: bool = False,
    sqrt_mom: bool = False,
    stable_wd: bool = False,
    per_layer: bool = True,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """Adaptive inertia: per-layer (or per-weight) β₁ derived from the ratio
    of this layer's grad² EMA to the global mean. The global mean uses the
    PREVIOUS step's EMAs, exactly as the reference does (optimizers.py:456-461)."""
    b0, b2 = betas

    def init(params):
        return AdaiState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda p: jnp.full((), ema_norm_init, jnp.float32)
                if per_layer
                else jnp.full(p.shape, ema_norm_init, jnp.float32),
                params,
            ),
        )

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)
        old_vs = jax.tree_util.tree_leaves(state.exp_avg_sq)
        if per_layer:
            v_mean = sum(old_vs) / len(old_vs)
        else:
            v_mean = sum(jnp.mean(v) for v in old_vs) / len(old_vs)
        v_mean = jnp.where(state.count == 0, ema_norm_init, v_mean)

        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * (jnp.mean(g.astype(jnp.float32) ** 2) if per_layer else g.astype(jnp.float32) ** 2),
            state.exp_avg_sq,
            grads,
        )

        def beta1_of(v):
            ratio = v / v_mean
            if sqrt_mom:
                ratio = jnp.sqrt(ratio)
            return jnp.clip(1.0 - ratio * b0, 0.0, 1.0 - eps)

        def momentum(m, g, v):
            beta1 = beta1_of(v)
            if sgd_mom:
                return beta1 * m + g
            return beta1 * m + (1.0 - beta1) * g

        new_m = jax.tree_util.tree_map(momentum, state.exp_avg, grads, new_v)

        def delta(p, m, v, decay_on):
            upd = -lr * m
            wd = weight_decay if decay_on else 0.0
            if wd == 0.0:
                return upd
            if stable_wd:
                factor = lr * wd / (1.0 - beta1_of(v))
            else:
                factor = lr * wd
            return upd - factor * (p + upd)

        updates = jax.tree_util.tree_map(delta, params, new_m, new_v, mask)
        return updates, AdaiState(state.count + 1, new_m, new_v)

    return optax.GradientTransformation(init, update)


class AdaiSState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any
    beta1_prod: Any


def adais(
    learning_rate: Schedule,
    betas=(0.1, 0.99),
    eps: float = 1e-3,
    weight_decay: float = 0.0,
    ema_norm_init: float = 1e-3,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """AdaiS/AdaiW (reference optimizers.py:522-641): per-weight grad² EMA,
    bias-corrected global mean (computed AFTER this step's EMA update), β₁
    per weight with cumulative-product bias correction; decoupled wd applied
    before the step."""
    b0, b2 = betas

    def init(params):
        return AdaiSState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree_util.tree_map(lambda p: jnp.full(p.shape, ema_norm_init, jnp.float32), params),
            beta1_prod=jax.tree_util.tree_map(jnp.ones_like, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g.astype(jnp.float32) ** 2, state.exp_avg_sq, grads
        )
        total = sum(jnp.sum(v / bc2) for v in jax.tree_util.tree_leaves(new_v))
        n = sum(v.size for v in jax.tree_util.tree_leaves(new_v))
        v_hat_mean = total / n

        def per_leaf(p, g, m, v, bp, decay_on):
            wd = weight_decay if decay_on else 0.0
            p_decayed = p * (1.0 - lr * wd)  # decay BEFORE step (reference :613-615)
            v_hat = v / bc2
            beta1 = jnp.clip(1.0 - (v_hat / v_hat_mean) * b0, 0.0, 1.0 - eps)
            new_bp = bp * beta1
            new_m = beta1 * m + (1.0 - beta1) * g
            m_hat = new_m / (1.0 - new_bp)
            new_p = p_decayed - lr * m_hat
            return new_p - p, new_m, new_bp

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(new_v)
        flat_bp = treedef.flatten_up_to(state.beta1_prod)
        flat_mask = treedef.flatten_up_to(_tree_with_mask(params, wd_mask))
        results = [per_leaf(*args) for args in zip(flat_p, flat_g, flat_m, flat_v, flat_bp, flat_mask)]
        updates = jax.tree_util.tree_unflatten(treedef, [r[0] for r in results])
        new_m_tree = jax.tree_util.tree_unflatten(treedef, [r[1] for r in results])
        new_bp_tree = jax.tree_util.tree_unflatten(treedef, [r[2] for r in results])
        return updates, AdaiSState(count, new_m_tree, new_v, new_bp_tree)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------- #
# MADGRAD (reference optimizers.py:650-770, FB impl + decoupled-wd fix :766-767)
# --------------------------------------------------------------------------- #


class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum_sq: Any
    s: Any
    x0: Any


def madgrad(
    learning_rate: Schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """Dual-averaged adaptive method; p is an EMA toward the dual iterate z.
    wd is the reference's *decoupled* fix (``p *= 1 - wd``, optimizers.py:767)."""
    ck = 1.0 - momentum

    def init(params):
        return MadgradState(
            count=jnp.zeros((), jnp.int32),
            grad_sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            s=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(jnp.copy, params),
        )

    def update(grads, state, params):
        k = state.count
        lr = _lr_at(learning_rate, k) + eps
        lamb = lr * jnp.sqrt(k.astype(jnp.float32) + 1.0)
        new_gss = jax.tree_util.tree_map(lambda a, g: a + lamb * g.astype(jnp.float32) ** 2, state.grad_sum_sq, grads)
        new_s = jax.tree_util.tree_map(lambda s, g: s + lamb * g, state.s, grads)
        mask = _tree_with_mask(params, wd_mask)

        def delta(p, x0, gss, s, decay_on):
            rms = jnp.cbrt(gss) + eps
            z = x0 - s / rms
            new_p = (1.0 - ck) * p + ck * z
            wd = weight_decay if decay_on else 0.0
            new_p = new_p * (1.0 - wd)
            return new_p - p

        updates = jax.tree_util.tree_map(delta, params, state.x0, new_gss, new_s, mask)
        return updates, MadgradState(k + 1, new_gss, new_s, state.x0)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------- #
# AdamP (external adamp package used by 4 reference configs)
# --------------------------------------------------------------------------- #


class RMSpropState(NamedTuple):
    count: jnp.ndarray
    square_avg: Any
    grad_avg: Any
    buf: Any


def rmsprop(
    learning_rate: Schedule,
    alpha: float = 0.99,
    eps: float = 1e-8,
    momentum: float = 0.0,
    centered: bool = False,
    weight_decay: float = 0.0,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop semantics (legacy ``optim: rmsprop``,
    _old_configs/_first_attempts/effnetb0_tf.yaml — the EfficientNet recipe).
    Differs from optax.scale_by_rms: eps is OUTSIDE the sqrt and weight decay
    is L2 (added to the grad), exactly as torch does it."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        # grad_avg/buf are only read when centered/momentum are on; allocate a
        # scalar placeholder otherwise (torch allocates these lazily too) so a
        # default RMSprop doesn't carry two dead param-sized trees in HBM.
        ga = z if centered else jnp.zeros((), jnp.float32)
        buf = z if momentum else jnp.zeros((), jnp.float32)
        return RMSpropState(jnp.zeros((), jnp.int32), z, ga, buf)

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)
        grads = jax.tree_util.tree_map(
            lambda g, p, m: g + weight_decay * p if (weight_decay and m) else g, grads, params, mask
        )
        sq = jax.tree_util.tree_map(lambda s, g: alpha * s + (1 - alpha) * g**2, state.square_avg, grads)
        if centered:
            ga = jax.tree_util.tree_map(lambda a, g: alpha * a + (1 - alpha) * g, state.grad_avg, grads)
            avg = jax.tree_util.tree_map(lambda s, a: jnp.sqrt(jnp.maximum(s - a**2, 0.0)) + eps, sq, ga)
        else:
            ga = state.grad_avg
            avg = jax.tree_util.tree_map(lambda s: jnp.sqrt(s) + eps, sq)
        if momentum:
            buf = jax.tree_util.tree_map(lambda b, g, a: momentum * b + g / a, state.buf, grads, avg)
            updates = jax.tree_util.tree_map(lambda b: -lr * b, buf)
        else:
            buf = state.buf
            updates = jax.tree_util.tree_map(lambda g, a: -lr * g / a, grads, avg)
        return updates, RMSpropState(state.count + 1, sq, ga, buf)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: jnp.ndarray
    buf: Any


def sgdp(
    learning_rate: Schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    eps: float = 1e-8,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """SGDP (AdamP paper arXiv:2006.08217, official clovaai/adamp repo; legacy
    ``optim: sgdp``, exp62.GEnet_no_dim_red_ctmx_sgdp.yaml): SGD-momentum whose
    step is projected off the radial direction for scale-invariant (>=2D)
    weights; wd is applied as ``p *= 1 - lr*wd*ratio/(1-momentum)`` before the
    step, with ratio=wd_ratio when the projection fired. Projection uses the
    channel view in OUR layout (output axis last), matching zoo.adamp."""

    def init(params):
        return SGDPState(jnp.zeros((), jnp.int32), jax.tree_util.tree_map(jnp.zeros_like, params))

    def _channel_view(x):
        return x.reshape(-1, x.shape[-1]).T if x.ndim > 1 else x.reshape(1, -1)  # (out, fan_in)

    def _cos_sim(a, b, e=1e-8):
        an = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + e)
        bn = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + e)
        return jnp.abs(jnp.sum(an * bn, axis=1))

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        mask = _tree_with_mask(params, wd_mask)
        new_buf = jax.tree_util.tree_map(lambda b, g: momentum * b + g, state.buf, grads)

        def delta_fn(p, g, b, decay_on):
            d_p = g + momentum * b if nesterov else b
            ratio = 1.0
            if p.ndim > 1:
                pv, gv, sv = _channel_view(p), _channel_view(g), _channel_view(d_p)
                cos = _cos_sim(gv, pv)
                cond = jnp.max(cos) < delta / jnp.sqrt(pv.shape[1])
                p_n = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
                proj = sv - p_n * jnp.sum(sv * p_n, axis=1, keepdims=True)
                sv_out = jnp.where(cond, proj, sv)
                d_p = sv_out.T.reshape(p.shape)
                ratio = jnp.where(cond, wd_ratio, 1.0)
            wd = weight_decay if decay_on else 0.0
            if wd == 0.0:
                return -lr * d_p
            shrink = lr * wd * ratio / (1.0 - momentum)
            return -shrink * p - lr * d_p

        updates = jax.tree_util.tree_map(delta_fn, params, grads, new_buf, mask)
        return updates, SGDPState(state.count + 1, new_buf)

    return optax.GradientTransformation(init, update)


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def adamp(
    learning_rate: Schedule,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    nesterov: bool = False,
    wd_mask=None,
    **_: Any,
) -> optax.GradientTransformation:
    """AdamP (arXiv:2006.08217): Adam whose update is projected onto the
    tangent space of scale-invariant (norm-grown) weights; wd scaled by
    wd_ratio for projected params."""
    b1, b2 = betas

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros((), jnp.int32), z, jax.tree_util.tree_map(jnp.zeros_like, params))

    def _channel_view(x):
        return x.reshape(-1, x.shape[-1]).T if x.ndim > 1 else x.reshape(1, -1)  # (out, fan_in)

    def _cos_sim(a, b, e=1e-8):
        an = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + e)
        bn = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + e)
        return jnp.abs(jnp.sum(an * bn, axis=1))

    def update(grads, state, params):
        count = state.count + 1
        lr = _lr_at(learning_rate, state.count)
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf
        new_mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        new_nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g**2, state.nu, grads)
        mask = _tree_with_mask(params, wd_mask)

        def delta_fn(p, g, m, v, decay_on):
            denom = jnp.sqrt(v / bc2) + eps
            if nesterov:
                step = (b1 * m / bc1 + (1 - b1) * g / bc1) / denom
            else:
                step = (m / bc1) / denom
            ratio = 1.0
            if p.ndim > 1:
                pv, gv, sv = _channel_view(p), _channel_view(g), _channel_view(step)
                cos = _cos_sim(gv, pv)
                cond = jnp.max(cos) < delta / jnp.sqrt(pv.shape[1])
                expand_norm = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
                proj = sv - expand_norm * jnp.sum(sv * expand_norm, axis=1, keepdims=True)
                sv_out = jnp.where(cond, proj, sv)
                step = sv_out.T.reshape(p.shape) if p.ndim > 1 else sv_out.reshape(p.shape)
                ratio = jnp.where(cond, wd_ratio, 1.0)
            upd = -lr * step
            wd = weight_decay if decay_on else 0.0
            if wd == 0.0:
                return upd
            return upd - lr * wd * ratio * (p + upd)

        updates = jax.tree_util.tree_map(delta_fn, params, grads, new_mu, new_nu, mask)
        return updates, AdamPState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)
