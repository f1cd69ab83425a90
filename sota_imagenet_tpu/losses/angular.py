"""Metric-learning losses + sphere-normalized heads
(reference angular_losses.py, SURVEY.md §2.1 #13).

Split per the reference's own usage pattern: the *model* ends with a
sphere-normalized head (SphereLinearLayer / SphereMLPLayer,
angular_losses.py:202-245) producing cosine logits, and the *criterion*
operates on those cosines (AdaCos, AdditiveAngularMarginLoss, the auxiliary
sphere losses). AdaCos's running B/θ statistics become an explicit state
pytree (StatefulLoss) threaded through the jitted train step instead of
mutable buffers.

All math in float32; clamps mirror the reference's numeric guards
(angular_losses.py:81,328; SURVEY.md §5.2).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sota_imagenet_tpu.losses.base import Loss, StatefulLoss
from sota_imagenet_tpu.losses.smooth import CrossEntropyLoss

from sota_imagenet_tpu.utils.dtypes import at_least_f32

EPS = 1e-7


def _to_onehot_and_idx(target: jnp.ndarray, num_classes: int):
    if target.ndim == 1:
        idx = target.astype(jnp.int32)
        return jax.nn.one_hot(idx, num_classes, dtype=jnp.float32), idx
    onehot = at_least_f32(target)
    return onehot, jnp.argmax(onehot, axis=-1).astype(jnp.int32)


def _l2norm(x, axis=-1):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12, None)


# --------------------------------------------------------------------------- #
# Heads (model-side modules)
# --------------------------------------------------------------------------- #


class SphereLinearLayer(nn.Module):
    """Linear layer on the unit hyper-sphere: cos(features, class weights)
    (reference angular_losses.py:202-214)."""

    embedding_size: int = 0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, **_):
        w = self.param("weight", nn.initializers.xavier_uniform(), (x.shape[-1], self.num_classes), jnp.float32)
        xf = _l2norm(at_least_f32(x))
        wf = _l2norm(w, axis=0)
        return jnp.dot(xf, wf, preferred_element_type=jnp.float32)


class SphereMLPLayer(nn.Module):
    """SimCLR-style projector active only in training, then sphere linear
    (reference angular_losses.py:217-245): train: FC-BN-Act-FC -> cos head;
    val: cos head directly (unless val_projector)."""

    embedding_size: int = 0
    num_classes: int = 1000
    hidden_size: int = 4096
    act: str = "relu"
    val_projector: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        w = self.param("weight", nn.initializers.xavier_uniform(), (x.shape[-1], self.num_classes), jnp.float32)
        act = jax.nn.relu if self.act == "relu" else jax.nn.hard_silu
        proj = x
        proj = nn.Dense(self.hidden_size, use_bias=False, param_dtype=jnp.float32, name="fc1")(proj)
        proj = nn.BatchNorm(use_running_average=not train, param_dtype=jnp.float32, name="bn")(proj)
        proj = act(proj)
        proj = nn.Dense(x.shape[-1], param_dtype=jnp.float32, name="fc2")(proj)
        use_proj = train or self.val_projector
        feat = proj if use_proj else x
        xf = _l2norm(at_least_f32(feat))
        wf = _l2norm(w, axis=0)
        return jnp.dot(xf, wf, preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------- #
# Margin criteria on cosine logits
# --------------------------------------------------------------------------- #


class AdditiveAngularMarginLoss(Loss):
    """ArcFace margin on cosine logits (reference angular_losses.py:98-146)."""

    def __init__(self, final_criterion: Optional[Loss] = None, s: float = 10.0, m: float = 0.2):
        self.s, self.m = s, m
        self.cos_m, self.sin_m = math.cos(m), math.sin(m)
        self.th = math.cos(math.pi - m)
        self.mm = math.sin(math.pi - m) * m
        self.final_criterion = final_criterion or CrossEntropyLoss()

    def __call__(self, cosine: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        cosine = at_least_f32(cosine)
        onehot, _ = _to_onehot_and_idx(y_true, cosine.shape[-1])
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, None))
        phi = cosine * self.cos_m - sine * self.sin_m
        phi = jnp.where(cosine > self.th, phi, cosine - self.mm)
        output = (onehot * phi + (1.0 - onehot) * cosine) * self.s
        return self.final_criterion(output, y_true)


class LargeMarginCosineLoss(Loss):
    """CosFace margin on cosine logits (reference angular_losses.py:149-199;
    the head weight lives in the model's sphere layer here)."""

    def __init__(self, final_criterion: Optional[Loss] = None, s: float = 30.0, m: float = 0.40):
        self.s, self.m = s, m
        self.final_criterion = final_criterion or CrossEntropyLoss()

    def __call__(self, cosine: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        cosine = at_least_f32(cosine)
        onehot, _ = _to_onehot_and_idx(y_true, cosine.shape[-1])
        output = (onehot * (cosine - self.m) + (1.0 - onehot) * cosine) * self.s
        return self.final_criterion(output, y_true)


class AngularPenaltySMLoss(Loss):
    """arcface/sphereface/cosface unified margin softmax on cosine logits
    (reference angular_losses.py:13-95; weight matrix factored out into the
    model's SphereLinearLayer, matching the reference's own later pattern)."""

    _default_values = {"arcface": (64.0, 0.5), "sphereface": (64.0, 1.35), "cosface": (30.0, 0.4)}

    def __init__(self, loss_type: str = "arcface", s: Optional[float] = None, m: Optional[float] = None, **_):
        if loss_type not in self._default_values:
            raise ValueError(f"loss_type must be one of {sorted(self._default_values)}")
        ds, dm = self._default_values[loss_type]
        self.s, self.m = s or ds, m or dm
        self.loss_type = loss_type

    def __call__(self, cosine: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        wf = at_least_f32(cosine)
        onehot, idx = _to_onehot_and_idx(y_true, wf.shape[-1])
        true_cos = jnp.take_along_axis(wf, idx[:, None], axis=1)[:, 0]
        tc = jnp.clip(true_cos, -1.0 + EPS, 1.0 - EPS)
        if self.loss_type == "cosface":
            numerator = self.s * (true_cos - self.m)
        elif self.loss_type == "arcface":
            numerator = self.s * jnp.cos(jnp.arccos(tc) + self.m)
        else:  # sphereface
            numerator = self.s * jnp.cos(self.m * jnp.arccos(tc))
        # denominator: exp(num) + sum over non-target exp(s * cos)
        exp_all = jnp.exp(self.s * wf) * (1.0 - onehot)
        denom = jnp.exp(numerator) + jnp.sum(exp_all, axis=1)
        return -jnp.mean(numerator - jnp.log(denom))


class AdaCos(StatefulLoss):
    """AdaCos with running-median adaptive scale + optional margin
    (reference angular_losses.py:248-334). Running B / median-cos / s live in
    the loss-state pytree."""

    def __init__(
        self,
        final_criterion: Optional[Loss] = None,
        margin: float = 0.0,
        max_s: float = 20.0,
        fixed_s: Optional[float] = None,
        momentum: float = 0.95,
        arc_logits: bool = False,
        arc_margin: bool = False,
    ):
        if arc_logits and not arc_margin:
            raise ValueError("arc_logits=True requires arc_margin=True")
        self.final_criterion = final_criterion or CrossEntropyLoss()
        self.margin = margin
        self.max_s = max_s
        self.fixed_s = fixed_s
        self.momentum = momentum
        self.arc_logits = arc_logits
        self.arc_margin = arc_margin

    def init_state(self) -> Dict[str, jnp.ndarray]:
        return {
            "running_B": jnp.asarray(1000.0, jnp.float32),  # initial s ≈ 10
            "running_cos": jnp.asarray(0.7, jnp.float32),  # ≈ cos(pi/4)
            "prev_s": jnp.asarray(self.max_s, jnp.float32),
        }

    def __call__(self, cosine: jnp.ndarray, y_true: jnp.ndarray, state=None):
        state = state if state is not None else self.init_state()
        cosine = at_least_f32(cosine)
        onehot, idx = _to_onehot_and_idx(y_true, cosine.shape[-1])

        neg_mask = onehot == 0
        B_batch = jnp.sum(jnp.where(neg_mask, jnp.exp(cosine * state["prev_s"]), 0.0)) / cosine.shape[0]
        true_cos = jnp.take_along_axis(cosine, idx[:, None], axis=1)[:, 0]
        med_cos = jnp.median(true_cos)
        running_B = state["running_B"] * self.momentum + B_batch * (1 - self.momentum)
        running_cos = state["running_cos"] * self.momentum + med_cos * (1 - self.momentum)
        prev_s = jnp.log(running_B) / (jnp.clip(running_cos, 0.7, None) - self.margin)
        prev_s = jnp.minimum(prev_s, self.max_s)  # blows up early without the cap
        new_state = {
            "running_B": jax.lax.stop_gradient(running_B),
            "running_cos": jax.lax.stop_gradient(running_cos),
            "prev_s": jax.lax.stop_gradient(prev_s),
        }

        if self.arc_logits:
            c = jnp.clip(cosine, -1.0 + EPS, 1.0 - EPS)
            theta = jnp.arccos(c)
            logits = -jnp.where(neg_mask, theta, theta + self.margin)
        else:
            logits = jnp.where(neg_mask, cosine, cosine - self.margin)
        scale = self.fixed_s if self.fixed_s is not None else jax.lax.stop_gradient(prev_s)
        loss = self.final_criterion(logits * scale, onehot)
        return loss, new_state


# --------------------------------------------------------------------------- #
# Auxiliary sphere losses
# --------------------------------------------------------------------------- #


class SphereMAELoss(Loss):
    """Mean angle to the true class, above a threshold (reference
    angular_losses.py:418-439). Collapses alone — combine with another loss."""

    def __init__(self, threshold: float = 0.2):
        self.threshold = threshold

    def __call__(self, cosine, y_true):
        cosine = at_least_f32(cosine)
        _, idx = _to_onehot_and_idx(y_true, cosine.shape[-1])
        theta = jnp.arccos(jnp.clip(jnp.take_along_axis(cosine, idx[:, None], 1)[:, 0], -1 + EPS, 1 - EPS))
        mask = theta > self.threshold
        cnt = jnp.sum(mask)
        return jnp.where(cnt > 0, jnp.sum(jnp.where(mask, theta, 0.0)) / jnp.maximum(cnt, 1), 0.0)


class SphereCosMAELoss(Loss):
    """Cosine-space variant (reference angular_losses.py:442-464)."""

    def __init__(self, threshold: float = 0.98):
        self.threshold = threshold

    def __call__(self, cosine, y_true):
        cosine = at_least_f32(cosine)
        _, idx = _to_onehot_and_idx(y_true, cosine.shape[-1])
        tc = jnp.take_along_axis(cosine, idx[:, None], 1)[:, 0]
        mask = tc < self.threshold
        cnt = jnp.sum(mask)
        return jnp.where(cnt > 0, 1.0 - jnp.sum(jnp.where(mask, tc, 0.0)) / jnp.maximum(cnt, 1), 0.0)


class NegativeContrastive(Loss):
    """Spreads negative classes (reference angular_losses.py:467-484)."""

    def __init__(self, eta: float = 0.999):
        self.eta = eta

    def __call__(self, cosine, y_true):
        cosine = at_least_f32(cosine)
        onehot, _ = _to_onehot_and_idx(y_true, cosine.shape[-1])
        s = float(np.log(self.eta / (1 - self.eta))) + jnp.log(jnp.asarray(cosine.shape[1], jnp.float32))
        neg = jnp.where(onehot == 0, cosine, -1.0)
        return jnp.mean(jnp.log1p(jnp.sum(jnp.exp(neg * s), axis=-1)))


class DSoftmax_intra(Loss):
    """Pulls true-class cosine toward a threshold (reference
    angular_losses.py:487-511)."""

    def __init__(self, threshold: float = 0.90):
        self.threshold = threshold

    def __call__(self, cosine, y_true):
        cosine = at_least_f32(cosine)
        _, idx = _to_onehot_and_idx(y_true, cosine.shape[-1])
        tc = jnp.take_along_axis(cosine, idx[:, None], 1)[:, 0]
        s = 16.0
        return jnp.mean(jnp.log1p(jnp.exp((self.threshold - tc) * s)))


class MyLoss1(Loss):
    """Combined intra (D-Softmax) + inter (NegativeContrastive) loss
    (reference angular_losses.py:514-569)."""

    def __init__(self, w_intra: float = 1.0, w_inter: float = 1.0, intra_threshold: float = 0.9, eta: float = 0.999):
        self.w_intra, self.w_inter = w_intra, w_inter
        self.intra_threshold = intra_threshold
        self.eta = eta

    def __call__(self, cosine, y_true):
        cosine = at_least_f32(cosine)
        onehot, idx = _to_onehot_and_idx(y_true, cosine.shape[-1])
        s_inter = float(np.log(self.eta / (1 - self.eta))) + jnp.log(jnp.asarray(cosine.shape[1], jnp.float32))
        neg = jnp.where(onehot == 0, cosine, -1.0)
        l_inter = jnp.mean(jnp.log1p(jnp.sum(jnp.exp(neg * s_inter), axis=-1)))
        tc = jnp.take_along_axis(cosine, idx[:, None], 1)[:, 0]
        l_intra = jnp.mean(jnp.log1p(jnp.exp((self.intra_threshold - tc) * 16.0)))
        return l_intra * self.w_intra + l_inter * self.w_inter


class ArcCosSoftmax(CrossEntropyLoss):
    """CE over negative angles (reference angular_losses.py:572-576)."""

    def __call__(self, y_pred, y_true):
        y_pred = -jnp.arccos(jnp.clip(at_least_f32(y_pred), -1 + EPS, 1 - EPS))
        return super().__call__(y_pred, y_true)


class ArcCosSoftmaxCenter(CrossEntropyLoss):
    """ArcCos CE + center loss on the true-class angle
    (reference angular_losses.py:601-616)."""

    def __init__(self, *args, center_weight: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.center_weight = center_weight

    def __call__(self, y_pred, y_true):
        theta = jnp.arccos(jnp.clip(at_least_f32(y_pred), -1 + EPS, 1 - EPS))
        cce = super().__call__(-theta, y_true)
        _, idx = _to_onehot_and_idx(y_true, y_pred.shape[-1])
        center = jnp.mean(jnp.take_along_axis(theta, idx[:, None], 1) ** 2)
        return cce + self.center_weight * center


# name registry (reference angular_losses.py:619-629)
LOSS_FROM_NAME = {
    "arcface": AdditiveAngularMarginLoss,
    "cosface": LargeMarginCosineLoss,
    "adacos": AdaCos,
    "cross_entropy": CrossEntropyLoss,
    "sphere_mae": SphereMAELoss,
    "sphere_cos_mae": SphereCosMAELoss,
    "negative_contrastive": NegativeContrastive,
    "dsoftmax_intra": DSoftmax_intra,
    "myloss1": MyLoss1,
    "arccos_softmax": ArcCosSoftmax,
    "arccos_softmax_center": ArcCosSoftmaxCenter,
}
