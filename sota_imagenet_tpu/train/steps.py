"""Jitted train/eval steps.

This is the TPU equivalent of the reference hot loop (pt.fit_wrapper.Runner's
per-batch work, SURVEY.md §3.1): forward (bf16) → loss → grad → optimizer
update → EMA, all inside ONE jit so XLA fuses and overlaps everything. The
DDP all-reduce disappears: the batch is a global array sharded over the mesh
'data' axis, so gradient reductions ride ICI automatically.

Features folded into the step (they were callbacks in the reference):
  * CutmixMixup batch transform (reference callbacks.py:232-247) — on device;
  * gradient accumulation (reference Runner accumulate_steps) — lax.scan over
    microbatches;
  * EMA of params (reference ModelEma, train.py:112);
  * SAM / ASAM second forward-backward (reference callbacks.py:279-419) —
    expressed as two grads in one jitted step;
  * bf16 activations — no GradScaler needed (TPU bf16 has fp32 range).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from sota_imagenet_tpu.losses.base import StatefulLoss, call_criterion
from sota_imagenet_tpu.train.metrics import classification_metrics
from sota_imagenet_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------- #
# Batch transforms (device-side)
# --------------------------------------------------------------------------- #


def cutmix_mixup(
    rng: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    cutmix_alpha: float = 1.0,
    mixup_alpha: float = 0.2,
    prob: float = 1.0,
    choice_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly apply cutmix OR mixup to a batch (reference CutmixMixup,
    callbacks.py:232-247; 50/50 choice). choice_prob = P(cutmix | applied):
    1.0 gives the standalone pt_clb.Cutmix, 0.0 the standalone Mixup.
    Labels must be soft/one-hot."""
    # YAML integers (prob: 1) must not reach bernoulli/beta as int dtypes
    cutmix_alpha, mixup_alpha = float(cutmix_alpha), float(mixup_alpha)
    prob, choice_prob = float(prob), float(choice_prob)
    # alpha == 0 disables that transform (legacy cutmix-only configs set
    # mixup_alpha: 0). Beta(0,0) samples NaN, and a NaN in the UNCHOSEN
    # where() branch still poisons labels on the steps that pick it — so the
    # disabled branch must be excluded statically, not by the 50/50 draw.
    if cutmix_alpha <= 0 and mixup_alpha <= 0:
        return images, labels
    if mixup_alpha <= 0:
        choice_prob = 1.0
    elif cutmix_alpha <= 0:
        choice_prob = 0.0
    k_apply, k_choice, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)
    b, h, w, _ = images.shape
    perm_images = images[::-1]
    perm_labels = labels[::-1]

    # mixup
    lam_m = jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    mix_img = lam_m * images + (1.0 - lam_m) * perm_images
    mix_lab = lam_m * labels + (1.0 - lam_m) * perm_labels

    # cutmix: box of area (1-lam)
    lam_c = jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1.0)
    ratio = jnp.sqrt(1.0 - lam_c)
    cut_h = (ratio * h).astype(jnp.int32)
    cut_w = (ratio * w).astype(jnp.int32)
    cy = jax.random.randint(k_box, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(k_box, 1), (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    in_box = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
    cut_img = jnp.where(in_box, perm_images, images)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)  # exact area after clipping
    cut_lab = lam_adj * labels + (1.0 - lam_adj) * perm_labels

    use_cutmix = jax.random.bernoulli(k_choice, choice_prob)
    out_img = jnp.where(use_cutmix, cut_img, mix_img)
    out_lab = jnp.where(use_cutmix, cut_lab, mix_lab)

    # DELIBERATE composition delta vs the reference (do not "fix"): the
    # reference picks cutmix/mixup 50/50 FIRST, then each applies with its own
    # prob (callbacks.py:240-247); we apply-with-prob first, then choose 50/50.
    # With equal per-transform probs (the only configuration the reference
    # ships) the joint marginals are identical.
    apply = jax.random.bernoulli(k_apply, prob)
    return (
        jnp.where(apply, out_img, images).astype(images.dtype),
        jnp.where(apply, out_lab, labels),
    )


# --------------------------------------------------------------------------- #
# State init
# --------------------------------------------------------------------------- #


def init_state(
    model: nn.Module,
    tx: optax.GradientTransformation,
    input_shape: Tuple[int, ...],
    rng: jax.Array,
    ema_decay: float = 0.0,
    input_dtype=jnp.float32,
    criterion: Optional[Callable] = None,
) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros(input_shape, input_dtype),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    loss_state = criterion.init_state() if isinstance(criterion, StatefulLoss) else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None,
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats) if ema_decay else None,
        loss_state=loss_state,
    )


# --------------------------------------------------------------------------- #
# Train / eval steps
# --------------------------------------------------------------------------- #


def _unitwise_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Per-output-unit norm. torch weights are (out, ...) and norm over all
    axes but the FIRST (reference optimizers.py:16-22); flax kernels are
    (..., out), so we norm over all axes but the LAST."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x**2, axis=axes, keepdims=True))


def remat_policy(remat: Any):
    """Map ``run.remat`` to a jax.checkpoint policy.

    * ``True`` / ``'full'`` — save nothing (jax.checkpoint default): the whole
      forward is recomputed during backward. Max memory saving, costs ~one
      extra forward of FLOPs.
    * ``'convs'`` — save conv/matmul OUTPUTS only, recompute the cheap
      bandwidth-bound tail (BN/act/pool). The CNN analog of the transformer
      "save dots" policy: MXU work is never redone, and the residuals XLA
      keeps shrink to one tensor per conv instead of every fused intermediate.

    No reference analog — torch keeps every autograd intermediate unless the
    user hand-wraps blocks in torch.utils.checkpoint; here it is one config
    knob applied at the loss closure, uniform over every model family.
    """
    if remat in (True, "full"):
        return None  # jax.checkpoint default: nothing saveable

    if remat == "convs":

        def save_matmuls(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")

        return save_matmuls
    raise ValueError(f"run.remat must be false | true | 'full' | 'convs', got {remat!r}")


def build_train_step(
    model: nn.Module,
    criterion: Callable,
    tx: optax.GradientTransformation,
    lr_schedule: Callable[[jnp.ndarray], jnp.ndarray] = lambda step: jnp.asarray(0.1, jnp.float32),
    *,
    accumulate_steps: int = 1,
    ema_decay: float = 0.0,
    mixup_fn: Optional[Callable] = None,
    aux_loss: Optional[Callable] = None,  # aux_loss(params) scalar, e.g. ortho loss
    sam: Optional[Dict[str, Any]] = None,  # {kind: 'sam'|'asam'|'asam_unitwise', rho, eta}
    grad_transform: Optional[Callable] = None,  # fn(grads, params) -> grads, e.g. AGC
    post_step_transform: Optional[Callable] = None,  # fn(params) -> params after the update (WeightNorm)
    remat: Any = False,  # activation rematerialization: False | True/'full' | 'convs'
    input_dtype=jnp.bfloat16,
    image_sharding=None,  # NamedSharding P('data','spatial'): spatial partitioning (mesh.image_sharding)
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    def loss_fn(params, batch_stats, loss_state, images, labels, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, updated = model.apply(
            variables,
            images.astype(input_dtype),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss, new_loss_state = call_criterion(criterion, logits, labels, loss_state)
        if aux_loss is not None:
            loss = loss + aux_loss(params)
        return loss, (updated.get("batch_stats", batch_stats), new_loss_state, logits)

    if remat:
        # Rematerialize the whole forward+loss closure under the chosen
        # policy. Numerics are bit-identical (same ops replayed with the same
        # rng); only the residual set XLA keeps across fwd→bwd changes.
        loss_fn = jax.checkpoint(loss_fn, policy=remat_policy(remat))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def sam_perturb(params, grads):
        """epsilon per SAM flavor (reference callbacks.py:279-419)."""
        kind = sam.get("kind", "asam")
        rho = sam.get("rho", 0.05)
        eta = sam.get("eta", 0.01)
        eps_n, eps_w = 1e-5, 1e-3
        if kind == "sam_original":  # ASAM à la SamsungLabs (callbacks.py:279-337)
            tw = jax.tree_util.tree_map(
                lambda p, g: g * jnp.clip(jnp.abs(p), eta, None) if p.ndim > 1 else g, params, grads
            )
            gnorm = optax.global_norm(tw)
            scale = rho / jnp.clip(gnorm, 2e-5, None)
            return jax.tree_util.tree_map(
                lambda p, g: (jnp.clip(p**2, eta, None) * g if p.ndim > 1 else g) * scale, params, grads
            )
        if kind == "asam_unitwise":  # unit-wise variant (callbacks.py:339-419)
            return jax.tree_util.tree_map(
                lambda p, g: rho
                * jnp.clip(_unitwise_norm(p), eps_w, None)
                / jnp.clip(_unitwise_norm(g), eps_n, None)
                * g,
                params,
                grads,
            )
        # layer-wise norm SAM (unitwise=False branch)
        return jax.tree_util.tree_map(
            lambda p, g: rho * jnp.clip(jnp.linalg.norm(p), eps_w, None) / jnp.clip(jnp.linalg.norm(g), eps_n, None) * g,
            params,
            grads,
        )

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_mix, k_drop, k_drop2 = jax.random.split(rng, 3)
        images, labels = batch["image"], batch["label"]
        if mixup_fn is not None:
            images, labels = mixup_fn(k_mix, images, labels)
        if image_sharding is not None:
            # spatial partitioning: redistribute H over the 'spatial' mesh axis
            # here (input arrives batch-sharded from the loader — augmentation
            # is per-image); everything downstream (convs, pools, BN) is then
            # partitioned by GSPMD with automatic halo exchange
            images = jax.lax.with_sharding_constraint(images, image_sharding)

        def batch_grads(params, bs0, ls0, key):
            """Mean loss/grads over the batch — the SAME microbatch scan for
            the clean AND the SAM-perturbed pass, so gradient accumulation
            keeps its memory bound on the second forward/backward too."""
            if accumulate_steps > 1:
                mb = images.shape[0] // accumulate_steps
                im_mb = images[: mb * accumulate_steps].reshape(accumulate_steps, mb, *images.shape[1:])
                lb_mb = labels[: mb * accumulate_steps].reshape(accumulate_steps, mb, *labels.shape[1:])

                def scan_body(carry, xs):
                    bs, ls, gsum, lsum = carry
                    im, lb, i = xs
                    (loss, (bs, ls, logits)), grads = grad_fn(params, bs, ls, im, lb, jax.random.fold_in(key, i))
                    gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                    return (bs, ls, gsum, lsum + loss), logits

                zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
                (bs, ls, grads, loss_sum), logits_all = jax.lax.scan(
                    scan_body,
                    (bs0, ls0, zero_g, 0.0),
                    (im_mb, lb_mb, jnp.arange(accumulate_steps)),
                )
                grads = jax.tree_util.tree_map(lambda g: g / accumulate_steps, grads)
                logits = logits_all.reshape(-1, logits_all.shape[-1])
                lbm = lb_mb.reshape(-1, lb_mb.shape[-1]) if labels.ndim > 1 else labels
                return loss_sum / accumulate_steps, bs, ls, grads, logits, lbm
            (loss, (bs, ls, logits)), grads = grad_fn(params, bs0, ls0, images, labels, key)
            return loss, bs, ls, grads, logits, labels

        loss, new_bs, new_ls, grads, logits, labels_for_metrics = batch_grads(
            state.params, state.batch_stats, state.loss_state, k_drop
        )

        if sam:
            # second grad at the perturbed point. Reference semantics
            # (callbacks.py:313-317): the perturbed forward ALSO updates BN
            # running stats, on top of the clean pass's update — matched here
            # by default (bn_from_perturbed=True). Set it False for the
            # arguably-more-correct clean-pass-only stats.
            eps = sam_perturb(state.params, grads)
            p_pert = jax.tree_util.tree_map(jnp.add, state.params, eps)
            if sam.get("bn_from_perturbed", True):
                # stateful criteria (AdaCos) likewise advance twice per step
                # in the reference (criterion re-called, callbacks.py:315)
                _, new_bs, new_ls, grads, _, _ = batch_grads(p_pert, new_bs, new_ls, k_drop2)
            else:
                _, _, _, grads, _, _ = batch_grads(p_pert, state.batch_stats, state.loss_state, k_drop2)

        if grad_transform is not None:  # e.g. AGC (reference AdaptiveGradientClipping)
            grads = grad_transform(grads, state.params)
        lr = lr_schedule(state.step)  # for metrics; tx owns the actual scaling
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if post_step_transform is not None:  # backward WeightNorm (reference callbacks.py:114-123)
            new_params = post_step_transform(new_params)

        new_ema = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if ema_decay:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), state.ema_params, new_params
            )
            # BN buffers are EMA'd with the same decay (reference ModelEma
            # averages the full state_dict incl. buffers, train.py:111-114)
            new_ema_bs = jax.tree_util.tree_map(
                lambda e, b: e * ema_decay + b * (1.0 - ema_decay), state.ema_batch_stats, new_bs
            )

        metrics = classification_metrics(logits, labels_for_metrics, loss)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
            loss_state=new_ls,
        )
        return new_state, metrics

    return train_step


def build_eval_step(
    model: nn.Module,
    criterion: Callable,
    *,
    input_dtype=jnp.bfloat16,
    use_ema: bool = False,
    image_sharding=None,  # NamedSharding P('data','spatial'): spatial partitioning (mesh.image_sharding)
) -> Callable[[TrainState, Batch], Dict[str, jnp.ndarray]]:
    def eval_step(state: TrainState, batch: Batch):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        bs = state.ema_batch_stats if (use_ema and state.ema_batch_stats is not None) else state.batch_stats
        variables = {"params": params}
        if bs:
            variables["batch_stats"] = bs
        images = batch["image"].astype(input_dtype)
        if image_sharding is not None:
            images = jax.lax.with_sharding_constraint(images, image_sharding)
        logits = model.apply(variables, images, train=False)
        if "mask" in batch:
            # rectangular validation: padded samples are masked out; metrics
            # are exact masked means, "_weight" carries the real sample count
            # so Runner.evaluate can weight batches (last bucket batch is
            # partial). Loss uses per-sample reduction when the criterion
            # supports it.
            mask = batch["mask"].astype(jnp.float32)
            n_real = jnp.sum(mask)  # true sample count (can be 0: all-padding batch)
            n = jnp.maximum(n_real, 1.0)  # division floor only
            from sota_imagenet_tpu.train.metrics import accuracy_topk

            m = {
                "Acc@1": jnp.sum(accuracy_topk(logits, batch["label"], 1, mean=False) * mask) / n,
                "Acc@5": jnp.sum(accuracy_topk(logits, batch["label"], 5, mean=False) * mask) / n,
            }
            if hasattr(criterion, "reduction"):
                import copy as _copy

                crit_ns = _copy.copy(criterion)
                crit_ns.reduction = "none"
                per_sample, _ = call_criterion(crit_ns, logits, batch["label"], state.loss_state)
                if per_sample.ndim > 1:  # e.g. BinaryKLDiv 'none' is (B, C)
                    per_sample = jnp.mean(per_sample, axis=tuple(range(1, per_sample.ndim)))
                m["loss"] = jnp.sum(per_sample.astype(jnp.float32) * mask) / n
            else:  # stateful/complex criteria: loss over the full batch incl. pads
                loss, _ = call_criterion(criterion, logits, batch["label"], state.loss_state)
                m["loss"] = loss.astype(jnp.float32)
            # weight by the TRUE count so an all-padding batch contributes 0,
            # not a phantom sample of accuracy 0 (the floor is only to avoid
            # a 0/0 in the per-batch means above).
            m["_weight"] = n_real
            return m
        loss, _ = call_criterion(criterion, logits, batch["label"], state.loss_state)
        return classification_metrics(logits, batch["label"], loss)

    return eval_step
