"""Callback system (reference pytorch_tools fit_wrapper callbacks + custom
callbacks.py).

Two kinds, reflecting the TPU split:

  * host callbacks — logging, checkpointing, timing, TensorBoard histograms:
    run between jitted steps, observe ``runner`` (epoch, meters, state);
  * step contributors — things the reference did by mutating runner state
    inside the hot loop (CutmixMixup batch mutation, SAM double backward,
    auxiliary losses added to the criterion): here they *contribute options to
    the jitted train step* via ``step_options()``, so the hot loop stays one
    fused XLA program.

Rank-zero gating (reference ``rank_zero_only``) is `jax.process_index() == 0`.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu import registry
from sota_imagenet_tpu.train.steps import cutmix_mixup
from sota_imagenet_tpu.utils.logging import get_logger


def is_master() -> bool:
    return jax.process_index() == 0


class Callback:
    """Base/no-op callback (also aliased to the reference's
    pytorch_tools...Callback so configs with placeholder entries work)."""

    runner = None  # set by Runner

    def set_runner(self, runner):
        self.runner = runner

    # host hooks
    def on_begin(self):
        pass

    def on_epoch_begin(self, epoch: int):
        pass

    def on_batch_end(self, step: int, metrics: Dict[str, float]):
        pass

    def on_epoch_end(self, epoch: int, train_metrics: Dict[str, float], val_metrics: Optional[Dict[str, float]]):
        pass

    def on_end(self):
        pass

    # contributions to the jitted step (mixup_fn / sam / aux_loss)
    def step_options(self) -> Dict[str, Any]:
        return {}


class CutmixMixup(Callback):
    """Random cutmix-or-mixup per batch (reference callbacks.py:232-247) —
    runs on device inside the train step."""

    def __init__(
        self,
        cutmix_alpha: float = 1.0,
        mixup_alpha: float = 0.2,
        prob: float = 0.5,
        stop_epoch: Optional[int] = None,
    ):
        self.cutmix_alpha = cutmix_alpha
        self.mixup_alpha = mixup_alpha
        self.prob = prob
        # legacy progressive recipes turn cutmix OFF for a final clean stage
        # (resnet34_best.yaml phase {"ep": 180, "cutmix": 0.0}); stages starting
        # at/after stop_epoch build their train step without the mixup_fn
        self.stop_epoch = stop_epoch

    def step_options(self):
        import functools

        if self.stop_epoch is not None and getattr(self.runner, "base_epoch", 0) >= self.stop_epoch:
            return {}
        return {
            "mixup_fn": functools.partial(
                cutmix_mixup, cutmix_alpha=self.cutmix_alpha, mixup_alpha=self.mixup_alpha, prob=self.prob
            )
        }


class Cutmix(Callback):
    """Cutmix-only batch transform (reference pt_clb.Cutmix, used by the bnet
    configs). num_classes is accepted for reference-config compatibility but
    unused — labels are already one-hot in the loader."""

    def __init__(self, alpha: float = 1.0, num_classes: Optional[int] = None, prob: float = 0.5):
        self.alpha = alpha
        self.prob = prob

    def step_options(self):
        import functools

        return {
            "mixup_fn": functools.partial(
                cutmix_mixup, cutmix_alpha=self.alpha, mixup_alpha=1.0, prob=self.prob, choice_prob=1.0
            )
        }


class Mixup(Callback):
    """Mixup-only batch transform (reference pt_clb.Mixup)."""

    def __init__(self, alpha: float = 0.2, num_classes: Optional[int] = None, prob: float = 0.5):
        self.alpha = alpha
        self.prob = prob

    def step_options(self):
        import functools

        return {
            "mixup_fn": functools.partial(
                cutmix_mixup, cutmix_alpha=1.0, mixup_alpha=self.alpha, prob=self.prob, choice_prob=0.0
            )
        }


class SAMOriginal(Callback):
    """ASAM à la SamsungLabs (reference callbacks.py:279-337) as a second grad
    inside the jitted step."""

    def __init__(self, rho: float = 0.5, eta: float = 0.01, bn_from_perturbed: bool = True):
        self.rho, self.eta = rho, eta
        self.bn_from_perturbed = bn_from_perturbed

    def step_options(self):
        return {
            "sam": {
                "kind": "sam_original",
                "rho": self.rho,
                "eta": self.eta,
                "bn_from_perturbed": self.bn_from_perturbed,
            }
        }


class SAM(Callback):
    """Layer-wise / unit-wise SAM (reference callbacks.py:339-419).
    bn_from_perturbed=True matches the reference (its perturbed forward also
    updates BN running stats); False keeps stats from the clean pass."""

    def __init__(self, unitwise: bool = False, rho: float = 0.01, bn_from_perturbed: bool = True):
        self.unitwise, self.rho = unitwise, rho
        self.bn_from_perturbed = bn_from_perturbed

    def step_options(self):
        return {
            "sam": {
                "kind": "asam_unitwise" if self.unitwise else "asam",
                "rho": self.rho,
                "bn_from_perturbed": self.bn_from_perturbed,
            }
        }


class ForwardWeightNorm(Callback):
    """Turn convs into WS convs via a forward parametrization (reference
    callbacks.py:62-84). use_std=True requires gamma (scaled WS); False does
    zero-mean only. Depthwise kernels (shape[2]==1) are skipped, matching the
    reference's ``groups == 1`` filter."""

    def __init__(self, gamma: Optional[float] = None, use_std: bool = False):
        if use_std and gamma is None:
            raise ValueError("use_std=True requires gamma")
        self.gamma = gamma if use_std else None

    def step_options(self):
        from sota_imagenet_tpu.models.parametrize import weight_standardization_fn

        return {"parametrization": weight_standardization_fn(self.gamma)}


class ForwardSpectralNorm(Callback):
    """Spectral-norm parametrization for all convs (reference
    callbacks.py:87-101). torch-parity semantics: a persistent u/v pair per
    kernel (warm-started with 15 power iterations like torch's _SpectralNorm
    init), n_iters power iterations per training forward (torch default 1),
    eval reuses the stored vectors. The u/v state lives in batch_stats so it
    is checkpointed and EMA'd like torch buffers."""

    def __init__(self, n_iters: int = 1):
        self.n_iters = n_iters

    def step_options(self):
        from sota_imagenet_tpu.models.parametrize import SpectralNormParametrization

        return {"parametrization": SpectralNormParametrization(self.n_iters)}


class WeightNorm(Callback):
    """Backward centered weight normalization: project weights to the unit
    sphere after every optimizer step (reference callbacks.py:104-123)."""

    def step_options(self):
        from sota_imagenet_tpu.models.parametrize import backward_weight_norm

        return {"post_step_transform": backward_weight_norm}


class AdaptiveGradientClipping(Callback):
    """AGC (pytorch_tools callback used by 2 reference configs; NFNet
    arXiv:2102.06171): clip grads by unit-wise grad/param norm ratio."""

    def __init__(self, clipping: float = 0.01, eps: float = 1e-3, clip_factor: Optional[float] = None):
        # pytorch_tools names the arg clip_factor (reference 80_1 config)
        self.clipping = clip_factor if clip_factor is not None else clipping
        self.eps = eps

    def step_options(self):
        from sota_imagenet_tpu.optim.factory import agc

        return {"grad_transform": agc(self.clipping, self.eps)}


# --------------------------------------------------------------------------- #
# Auxiliary losses (reference callbacks.py:126-229) — pure functions of params
# --------------------------------------------------------------------------- #


def _iter_matrices(params):
    """(path, kernel-as-matrix (out, fan_in)) for conv (HWIO) + dense kernels."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if leaf.ndim == 4:  # HWIO conv kernel -> (O, H*W*I)
            yield name, jnp.transpose(leaf, (3, 0, 1, 2)).reshape(leaf.shape[3], -1)
        elif leaf.ndim == 2 and "kernel" in name:  # dense (in, out) -> (O, I)
            yield name, leaf.T


class OrthoLossClb(Callback):
    """Kernel (type 1) or convolutional (type 2) orthogonality loss added to
    the criterion (reference OrthoLoss/OrthoLoss2 + OrthoLossClb,
    callbacks.py:126-203).

    Note on type 2 and strided convs: the reference's skip condition
    ``m.stride == 2`` (callbacks.py:170) compares a TUPLE to an int — always
    False — so no conv is actually skipped there. Applying the loss to every
    eligible conv kernel here matches the reference's actual behavior."""

    def __init__(self, weight: float = 0.01, type: int = 1, eps: float = 1e-2, min_filters: int = 384, min_norm: float = 1.0, **_):
        self.weight = weight
        self.type = type
        self.eps = eps
        self.min_filters = min_filters
        self.min_norm = min_norm

    def step_options(self):
        if self.type == 1:
            def aux(params):
                loss = jnp.asarray(0.0, jnp.float32)
                for _, mat in _iter_matrices(params):
                    o, f = mat.shape
                    if o > f or o < self.min_filters:
                        continue  # can't orthonormalize more filters than dims (callbacks.py:143-146)
                    m = mat.astype(jnp.float32)
                    corr = m @ m.T - jnp.eye(o, dtype=jnp.float32)
                    n = jnp.linalg.norm(corr)
                    loss = loss + jnp.where(n / o > self.min_norm, n, 0.0)
                return loss * self.weight

            return {"aux_loss": aux}

        def aux2(params):
            # conv-orthogonality (reference OrthoLoss2, callbacks.py:159-188)
            loss = jnp.asarray(0.0, jnp.float32)
            flat, _ = jax.tree_util.tree_flatten_with_path(params)
            for path, w in flat:
                if w.ndim != 4 or w.shape[3] > w.shape[0] * w.shape[1] * w.shape[2]:
                    continue
                k = w.shape[0]
                w32 = w.astype(jnp.float32)
                inp = jnp.transpose(w32, (3, 0, 1, 2))  # (O,kh,kw,I) as NHWC
                corr = jax.lax.conv_general_dilated(
                    inp, w32, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
                )  # (O, 2k-1, 2k-1, O)
                mat = jnp.transpose(w32, (3, 0, 1, 2)).reshape(w32.shape[3], -1)
                norms2 = jnp.sum(mat**2, axis=-1).reshape(-1, 1, 1, 1)
                corr = corr / (norms2 + 1e-4)
                target = jnp.zeros_like(corr).at[:, k - 1, k - 1, :].set(jnp.eye(corr.shape[0]))
                loss = loss + jnp.linalg.norm(corr - target)
            return loss * self.weight

        return {"aux_loss": aux2}


class NormLossClb(Callback):
    """(1 - ||filter||)^2 regularizer (reference NormLoss, callbacks.py:206-229)."""

    def __init__(self, weight: float = 1e-4):
        self.weight = weight

    def step_options(self):
        def aux(params):
            loss = jnp.asarray(0.0, jnp.float32)
            for _, mat in _iter_matrices(params):
                if mat.size < 64:
                    continue  # skip tiny weights, e.g. ECA (callbacks.py:215)
                norms = jnp.linalg.norm(mat.astype(jnp.float32), axis=-1)
                loss = loss + jnp.mean((1.0 - norms) ** 2)
            return loss * self.weight

        return {"aux_loss": aux}


class OrthoInitClb(Callback):
    """Orthogonal (re)initialization of conv/dense kernels at on_begin
    (reference callbacks.py:250-266)."""

    def __init__(self, gain: float = 1.0):
        self.gain = gain
        self._done = False

    def on_begin(self):
        if self._done or self.runner is None:
            return
        self._done = True
        get_logger().info("Applying orthogonal initialization")
        rng = jax.random.PRNGKey(0)
        init = jax.nn.initializers.orthogonal(scale=self.gain)

        def reinit(path, leaf):
            nonlocal rng
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if leaf.ndim >= 2 and "kernel" in name:
                rng, sub = jax.random.split(rng)
                try:
                    return init(sub, leaf.shape, leaf.dtype)
                except Exception:
                    return leaf
            return leaf

        flat, treedef = jax.tree_util.tree_flatten_with_path(self.runner.state.params)
        new_leaves = [reinit(p, l) for p, l in flat]
        self.runner.state = self.runner.state.replace(params=jax.tree_util.tree_unflatten(treedef, new_leaves))


# --------------------------------------------------------------------------- #
# Host-side observability callbacks
# --------------------------------------------------------------------------- #


class Profiler(Callback):
    """jax.profiler trace over a step window (SURVEY.md §5.1 — the reference
    had no profiler integration at all). Produces a TensorBoard-viewable
    trace under <log_dir>/plugins/profile."""

    def __init__(self, log_dir: str = ".", start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def on_batch_end(self, step, metrics):
        if not is_master():
            return
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            self._active = False
            get_logger().info(f"Profiler trace written to {self.log_dir}")

    def on_end(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class ConsoleLogger(Callback):
    """Epoch summary lines (reference ConsoleLogger + FileLogger; both write
    through the shared logger, which already has stdout+file sinks)."""

    def on_epoch_end(self, epoch, train_metrics, val_metrics):
        if not is_master():
            return
        log = get_logger()
        tm = " | ".join(f"{k}: {v:.4f}" for k, v in train_metrics.items() if k in ("loss", "Acc@1", "Acc@5"))
        log.info(f"Epoch {epoch:3d} | Train {tm}")
        if val_metrics:
            vm = " | ".join(f"{k}: {v:.4f}" for k, v in val_metrics.items() if k in ("loss", "Acc@1", "Acc@5"))
            log.info(f"Epoch {epoch:3d} | Val   {vm}")


class Timer(Callback):
    """Per-epoch wall-clock + images/sec (reference Timer, train.py:137)."""

    def on_epoch_begin(self, epoch):
        self._t0 = time.time()
        self._images = 0

    def on_batch_end(self, step, metrics):
        self._images += getattr(self.runner, "batch_size", 0) if self.runner else 0

    def on_epoch_end(self, epoch, train_metrics, val_metrics):
        if not is_master():
            return
        dt = time.time() - self._t0
        ips = self._images / dt if dt > 0 else 0.0
        # labelled as what it measures: host time NOT blocked on input (a
        # proxy — see loop.py's input_utilization comment; the e2e proof
        # lives in scripts/bench_input_pipeline.py)
        util = train_metrics.get("input_utilization")
        util_s = f" | host-wait-free {util * 100:.1f}%" if util is not None else ""
        get_logger().info(f"Epoch {epoch:3d} | {dt:.1f}s | {ips:.1f} img/s{util_s}")


class CheckpointSaver(Callback):
    """Save TrainState each epoch + keep the best by monitored val metric
    (pytorch_tools CheckpointSaver monitors loss; reference train.py:134).
    EMA lives inside TrainState — no ordering constraint needed."""

    def __init__(
        self,
        save_dir: str = ".",
        save_name: str = "model.ckpt",
        include_optimizer: bool = False,
        monitor: str = "loss",  # val metric; lower is better unless it's an Acc
    ):
        self.save_dir = save_dir
        self.save_name = save_name
        self.include_optimizer = include_optimizer
        self.monitor = monitor
        self._best: Optional[float] = None

    def on_epoch_end(self, epoch, train_metrics, val_metrics):
        # runs on EVERY process: orbax saves are collective (each shard written
        # once by its owner); only process 0 mutates the directory layout —
        # see train/checkpoint.py. Master-gating here would deadlock multihost.
        if self.runner is None:
            return
        from sota_imagenet_tpu.train.checkpoint import save_checkpoint

        state = self.runner.state
        if not self.include_optimizer:
            state = state.replace(opt_state=None)  # halves the file (reference log.save_optim)
        os.makedirs(self.save_dir, exist_ok=True)
        save_checkpoint(self.save_dir, state, epoch, name=self.save_name)
        val = (val_metrics or {}).get(self.monitor)
        if val is None:
            return
        better = val > (self._best if self._best is not None else -1e30) if self.monitor.startswith("Acc") else (
            val < (self._best if self._best is not None else 1e30)
        )
        if better:
            self._best = val
            save_checkpoint(self.save_dir, state, epoch, name="model_best.ckpt")
            get_logger().info(f"Epoch {epoch:3d} | new best {self.monitor}: {val:.4f}")

    def on_end(self):
        from sota_imagenet_tpu.train.checkpoint import finalize_checkpoints

        finalize_checkpoints()  # commit the last async save before exit


class TensorBoard(Callback):
    """Scalar logging every N steps (reference TensorBoard, train.py:139).

    Device scalars are BUFFERED during the epoch and read back in one
    device_get at epoch end: a per-step float() is a device->host readback in
    the hot loop, which stalls dispatch on any TPU and — through the axon
    tunnel — permanently degrades the transport (one readback collapses
    host->device bandwidth 1.5 GB/s -> 0.04 GB/s; PERF.md round 4). The TB
    event stream is identical: same tags, same step numbers."""

    def __init__(self, log_dir: str = ".", log_every: int = 50):
        self.log_dir = log_dir
        self.log_every = log_every
        self.writer = None
        self._buf = []  # [(step, {tag: device scalar})], flushed per epoch

    def on_begin(self):
        if not is_master():
            return
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(self.log_dir)

    def on_batch_end(self, step, metrics):
        if self.writer is None or step % self.log_every:
            return
        self._buf.append((step, metrics))

    def on_epoch_end(self, epoch, train_metrics, val_metrics):
        if self.writer is None:
            return
        if self._buf:
            steps, dev = zip(*self._buf)
            self._buf = []
            for step, m in zip(steps, jax.device_get(dev)):
                for k, v in m.items():
                    self.writer.add_scalar(f"train/{k}", float(v), step)
        for k, v in (val_metrics or {}).items():
            self.writer.add_scalar(f"val/{k}", float(v), epoch)

    def on_end(self):
        if self.writer is not None:
            self.writer.close()


class WeightDistributionTB(Callback):
    """Per-epoch weight histograms (reference callbacks.py:11-17)."""

    def on_epoch_begin(self, epoch):
        tb = getattr(self.runner, "tb_writer", None) if self.runner else None
        if tb is None or not is_master():
            return
        flat, _ = jax.tree_util.tree_flatten_with_path(self.runner.state.params)
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            tb.add_histogram(f"model/{name}", np.asarray(leaf).ravel(), epoch)


class SpectralDistributionTB(Callback):
    """Singular-value spectra of conv/fc kernels (reference callbacks.py:20-28)."""

    def on_epoch_begin(self, epoch):
        tb = getattr(self.runner, "tb_writer", None) if self.runner else None
        if tb is None or not is_master():
            return
        flat, _ = jax.tree_util.tree_flatten_with_path(self.runner.state.params)
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if leaf.ndim < 2 or "kernel" not in name:
                continue
            mat = np.asarray(leaf).reshape(-1, leaf.shape[-1]).T
            spec = np.linalg.svd(mat, compute_uv=False)
            tb.add_histogram(f"spectrum/{name}", spec, epoch)


class GradDistributionTB(Callback):
    """log10 |params| and |optimizer state| distributions
    (reference callbacks.py:30-60)."""

    def __init__(self, log_every: int = 500, subsample: int = 10):
        self.log_every = log_every
        self.subsample = subsample
        # the histogram is computed ON DEVICE (a jitted reduce over params)
        # and only the 64 bucket counts + 4 scalars are buffered; pulling the
        # raw params to host every N steps is a mid-epoch D2H readback (see
        # TensorBoard docstring for why those are banned from the hot loop)
        self._edges = np.linspace(-15.0, 5.0, 65, dtype=np.float32)
        self._jit_hist = None
        self._buf = []  # [(step, device stats)], flushed per epoch

    def _build(self):
        edges = jnp.asarray(self._edges)
        sub = self.subsample

        def hist(params):
            vals = jnp.concatenate(
                [jnp.abs(l.astype(jnp.float32).ravel()[::sub]) for l in jax.tree_util.tree_leaves(params)]
            )
            logs = jnp.clip(jnp.log10(vals + 1e-30), -15.0, 5.0)
            counts, _ = jnp.histogram(logs, bins=edges)
            return {
                "counts": counts,
                "min": logs.min(),
                "max": logs.max(),
                "sum": logs.sum(),
                "sumsq": jnp.square(logs).sum(),
            }

        self._jit_hist = jax.jit(hist)

    def on_batch_end(self, step, metrics):
        if step % self.log_every or self.runner is None:
            return
        # The jitted reduce runs over the globally-sharded params: on a
        # multi-process pod EVERY process must dispatch it (a master-only
        # launch over non-fully-addressable arrays errors/hangs the pod) —
        # only the TensorBoard write at epoch end is master-gated. The
        # outputs are tiny replicated scalars/counts, so the non-master
        # device_get-free drop at epoch end is cheap.
        if jax.process_count() == 1 and getattr(self.runner, "tb_writer", None) is None:
            return  # single process, no sink: don't burn device compute
        if self._jit_hist is None:
            self._build()
        self._buf.append((step, self._jit_hist(self.runner.state.params)))

    def on_epoch_end(self, epoch, train_metrics, val_metrics):
        tb = getattr(self.runner, "tb_writer", None) if self.runner else None
        if tb is None or not self._buf:
            self._buf = []
            return
        steps, dev = zip(*self._buf)
        self._buf = []
        for step, s in zip(steps, jax.device_get(dev)):
            tb.add_histogram_raw(
                "optim/model_params_log",
                min=float(s["min"]),
                max=float(s["max"]),
                num=int(s["counts"].sum()),
                sum=float(s["sum"]),
                sum_squares=float(s["sumsq"]),
                bucket_limits=self._edges[1:].tolist(),
                bucket_counts=s["counts"].tolist(),
                global_step=step,
            )


# registry entries so configs instantiate these by target path
registry.register("Callback", aliases=("pytorch_tools.fit_wrapper.callbacks.Callback",))(Callback)
registry.register("CutmixMixup", aliases=("src.callbacks.CutmixMixup", "sota_imagenet.callbacks.CutmixMixup"))(
    CutmixMixup
)
registry.register("Cutmix", aliases=("pytorch_tools.fit_wrapper.callbacks.Cutmix", "pt_clb.Cutmix"))(Cutmix)
registry.register("Mixup", aliases=("pytorch_tools.fit_wrapper.callbacks.Mixup", "pt_clb.Mixup"))(Mixup)
registry.register("SAM", aliases=("src.callbacks.SAM",))(SAM)
registry.register("ForwardWeightNorm", aliases=("src.callbacks.ForwardWeightNorm",))(ForwardWeightNorm)
registry.register("ForwardSpectralNorm", aliases=("src.callbacks.ForwardSpectralNorm",))(ForwardSpectralNorm)
registry.register("WeightNorm", aliases=("src.callbacks.WeightNorm",))(WeightNorm)
registry.register(
    "AdaptiveGradientClipping", aliases=("pytorch_tools.fit_wrapper.callbacks.AdaptiveGradientClipping",)
)(AdaptiveGradientClipping)
registry.register("SAMOriginal", aliases=("src.callbacks.SAMOriginal",))(SAMOriginal)
registry.register("OrthoLossClb", aliases=("src.callbacks.OrthoLossClb",))(OrthoLossClb)
registry.register("NormLossClb", aliases=("src.callbacks.NormLossClb",))(NormLossClb)
registry.register("OrthoInitClb", aliases=("src.callbacks.OrthoInitClb",))(OrthoInitClb)
registry.register("WeightDistributionTB", aliases=("src.callbacks.WeightDistributionTB",))(WeightDistributionTB)
registry.register("SpectralDistributionTB", aliases=("src.callbacks.SpectralDistributionTB",))(SpectralDistributionTB)
registry.register("GradDistributionTB", aliases=("src.callbacks.GradDistributionTB",))(GradDistributionTB)
registry.register("Profiler")(Profiler)
