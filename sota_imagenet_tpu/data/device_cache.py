"""HBM-resident dataset cache: feed the train loop entirely from device memory.

The TPU-native answer to the input-pipeline ceiling (SURVEY §7 hard part 1,
the >=95% accelerator-utilization north star; reference anchor: DALI's whole
reason to exist, dali_dataloader.py:44-124). Streaming decode can always be
outrun by a big enough chip; HBM cannot. So for datasets (or per-chip shards
of datasets) that fit, the fastest "storage tier" IS the accelerator:

* FILL (once per stage): the host loader's full local dataset is streamed to
  a uint8 cache array sharded over the mesh 'data' axis — images
  ``(N, H, W, 3)`` + labels ``(N,)``. ImageNet-scale math: 1.28M train crops
  at 224 px = ~185 GB, i.e. ~740 MB/chip on a 256-chip v5p pod slice — a few
  percent of HBM. One chip obviously can't hold ImageNet; a pod slice holds
  it trivially, and per-chip HBM feeds the MXU at TB/s against the ~GB/s a
  host NIC can stream.
* STEADY STATE (every step): a host-side numpy permutation slice (int32,
  one per-device row each) ships with the dispatch; a shard_map-LOCAL gather
  pulls the batch out of HBM (no collectives — guarded by test) and the
  fused Pallas augment runs as usual. Zero host->device image traffic, zero
  host decode, zero readbacks.

Sampling is per-shard without replacement: each data shard draws an
independent permutation of ITS resident samples every epoch (epoch-seeded,
reproducible). This is exactly DDP's sampler contract (each rank permutes
its fixed 1/n slice; reference train.py:61 relies on it via DALI's shards) —
not a global shuffle, and with the same statistical properties.

Augment diversity note: like the packed records this feeds from (FFCV-style,
data/packed.py), the random-crop geometry is baked at record-creation time;
flip/color/erase/mixup remain per-step on device.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sota_imagenet_tpu.utils.logging import get_logger


class DeviceCacheFeed:
    """Iterator-compatible replacement for DeviceFeed.

    ``host_loader`` is iterated ONCE at first use to fill the cache; it
    must yield raw ``(images_u8, labels[, mask])`` batches (packed/folder
    loaders). The device-resample split is incompatible (its host batches
    are variable-geometry canvases + meta, not final crops).

    Train (``is_train=True``): per-shard permutation sampling, tail trimmed
    to even shards (drop-last convention). Val (``is_train=False``): EXACT
    coverage — every real sample is stored exactly once, shards are padded
    (not trimmed) to a uniform multiple of the per-device batch, and every
    yielded batch carries a ``mask`` so the weighted metrics stay exact
    (same contract as the masked streaming val, pipeline.py)."""

    def __init__(
        self,
        host_loader,
        mesh,
        augment_fn,
        rng: Optional[np.ndarray] = None,
        label_divisor: int = 1,
        is_train: bool = True,
        **_,
    ):
        if getattr(host_loader, "meta_kind", None) == "resample":
            raise ValueError("loader.device_cache is incompatible with loader.device_resample (cache stores final crops)")
        self.mesh = mesh
        self.augment = augment_fn
        if rng is None:
            from sota_imagenet_tpu.utils.misc import host_prng_key

            rng = host_prng_key(0)
        self.rng = np.asarray(rng)
        self.label_divisor = max(int(label_divisor), 1)
        self.is_train = is_train
        self.batch_size = host_loader.batch_size * max(jax.process_count(), 1)
        self.epoch = 0
        self._step = 0

        n_data = mesh.shape["data"]
        if self.batch_size % n_data:
            raise ValueError(f"batch_size {self.batch_size} not divisible by data axis {n_data}")
        self._bs_local = self.batch_size // n_data
        self._n_data = n_data
        self._idx_sh = NamedSharding(mesh, P("data"))
        # fill is LAZY (first __len__/__iter__): progressive-resize resume
        # skips whole stages and the evaluate-only path never iterates the
        # train feed — neither should pay a full dataset stream into HBM
        self._host = host_loader
        self.images = self.labels = None
        self._n_per_shard = 0

    def _ensure_filled(self) -> None:
        if self.images is not None:
            return
        host_loader, self._host = self._host, None
        mesh = self.mesh

        # ---- fill: one pass over the host loader ----
        t0 = time.perf_counter()
        imgs_l, labs_l, valid_l = [], [], []
        for item in host_loader:
            imgs_l.append(item[0])
            labs_l.append(item[1])
            valid_l.append(item[2] if len(item) > 2 else np.ones(len(item[1]), np.float32))
        if not imgs_l:
            raise ValueError(
                "loader.device_cache: the host loader yielded no batches on this process "
                "(empty data shard?) — the cache cannot even infer the image shape"
            )
        imgs = np.concatenate(imgs_l, axis=0)
        labs = np.concatenate(labs_l, axis=0).astype(np.int32)
        valid = np.concatenate(valid_l, axis=0) > 0.5
        del imgs_l, labs_l, valid_l
        if self.label_divisor > 1:
            labs = np.where(labs >= 0, labs // self.label_divisor, labs)
        n_proc = max(jax.process_count(), 1)
        n_data = self._n_data
        shards_here = max(n_data // n_proc, 1)  # data shards this process feeds
        if self.is_train:
            # drop any masked pad rows first (3-tuple host loaders pad the
            # tail batch with validity 0 / label -1 — caching those would
            # train on all-zero one-hots), then the drop-last convention:
            # every data shard holds N // shards
            imgs, labs = imgs[valid], labs[valid]
            n_per = imgs.shape[0] // shards_here
        else:
            # EXACT val: keep every real sample once (drop the host loader's
            # own pad rows); the per-shard quota is padded UP to a multiple
            # of the per-device batch below
            imgs, labs = imgs[valid], labs[valid]
            q = -(-imgs.shape[0] // shards_here)  # ceil: per-shard quota
            n_per = -(-q // self._bs_local) * self._bs_local  # full device batches
        if n_proc > 1:
            # every process must contribute identical local shapes, or the
            # assembled global arrays / step counts diverge and the pod
            # hangs at the first collective. Harmonize instead of failing:
            # train trims to the global MIN (DDP drop-last analog); val pads
            # to the global MAX (pads are masked — exactness preserved)
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(np.asarray([n_per]))
            lo, hi = int(counts.min()), int(counts.max())
            if lo != hi:
                get_logger().warning(
                    f"device_cache per-shard counts differ across processes {counts.ravel().tolist()}: "
                    + ("trimming to the min (drop-last)" if self.is_train else "padding to the max (masked)")
                )
            n_per = lo if self.is_train else hi
        if self.is_train:
            keep = n_per * shards_here
            imgs, labs = imgs[:keep], labs[:keep]
        else:
            # pads carry label -1 and validity 0 so the weighted metrics
            # ignore them (same contract as the masked streaming val)
            total = n_per * shards_here
            validity = np.zeros((total,), np.float32)
            validity[: imgs.shape[0]] = 1.0
            pad = total - imgs.shape[0]
            if pad:
                # a process can hold ZERO valid val samples (uneven pod
                # split) — imgs[-1:] would then repeat to zero rows and the
                # per-process local shapes would diverge; pad rows are masked
                # anyway, so zeros are as good a filler as a repeated sample
                pad_src = imgs[-1:] if imgs.shape[0] else np.zeros((1,) + imgs.shape[1:], imgs.dtype)
                imgs = np.concatenate([imgs, np.repeat(pad_src, pad, axis=0)])
                labs = np.concatenate([labs, np.full(pad, -1, np.int32)])
        self._n_per_shard = n_per

        sh = NamedSharding(mesh, P("data"))
        try:
            self.images = jax.make_array_from_process_local_data(sh, imgs)
        except Exception as e:  # XlaRuntimeError has no stable class across backends
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                raise RuntimeError(
                    f"loader.device_cache does not fit: {imgs.nbytes / shards_here / 1e9:.2f} GB/device-shard of "
                    f"images (+activations/params/optimizer). Shard over more chips (mesh.data), cache a "
                    f"pre-resized smaller tree, or fall back to streaming (loader.use_packed without device_cache)."
                ) from e
            raise
        self.labels = jax.make_array_from_process_local_data(sh, labs)
        self._valid = (
            None if self.is_train else jax.make_array_from_process_local_data(sh, validity)
        )
        fill_s = time.perf_counter() - t0
        get_logger().info(
            f"Device cache: {self.images.shape[0]} x {imgs.shape[1:]} uint8 "
            f"({imgs.nbytes * n_proc / 1e6:.0f} MB global, {imgs.nbytes / shards_here / 1e6:.0f} MB/device-shard) "
            f"filled in {fill_s:.1f}s over data={n_data}"
        )
        del imgs, labs

        # gather is shard-LOCAL: per-device index rows select within that
        # device's resident slice — the compiled program has NO collectives
        # (tests/test_device_cache.py counts them in the HLO)
        from jax import shard_map

        def _local_gather(imgs, labs, idx):
            return jnp.take(imgs, idx, axis=0), jnp.take(labs, idx, axis=0)

        gathered = shard_map(
            _local_gather,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )

        if self.is_train:

            def _feed(key, imgs_cache, labs_cache, idx):
                g_img, g_lab = gathered(imgs_cache, labs_cache, idx)
                return self.augment(key, g_img, g_lab)

            # unjitted: composable into a larger jit (see fused_step)
            self.gather_augment = _feed
        else:
            gather_mask = shard_map(
                lambda v, idx: jnp.take(v, idx, axis=0),
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P("data"),
            )

            def _feed(key, imgs_cache, labs_cache, idx, valid_cache):
                g_img, g_lab = gathered(imgs_cache, labs_cache, idx)
                batch = self.augment(key, g_img, g_lab)
                batch["mask"] = gather_mask(valid_cache, idx)
                return batch

        self._feed = jax.jit(_feed)

    def fused_step(self, step_fn):
        """ONE-dispatch training: gather + augment + train step compiled
        into a single program (train only).

        ``step_fn`` must be the UNJITTED ``fn(state, batch, rng) ->
        (state, metrics)`` from train.steps.build_train_step. Returns a
        jitted ``fused(state, key, idx, images, labels, rng)`` (state
        donated). Two wins over the two-dispatch path: one host dispatch
        per step instead of two (each costs a tunnel round trip here,
        and serializes the dispatch thread on real TPU VMs), and the
        augment's elementwise tail can fuse into the first conv's input
        chain instead of materializing a bf16 batch between programs.
        Drive with :meth:`iter_stubs`; numerics are bit-identical to the
        two-dispatch path (tests/test_device_cache.py)."""
        if not self.is_train:
            raise ValueError("fused_step is train-only")
        self._ensure_filled()
        ga = self.gather_augment

        def fused(state, key, idx, images, labels, rng):
            return step_fn(state, ga(key, images, labels, idx), rng)

        return jax.jit(fused, donate_argnums=(0,))

    def iter_stubs(self):
        """One epoch of (key, idx) dispatch stubs for fused_step — the same
        keys/permutations __iter__ would consume (advances the epoch)."""
        yield from self._iter_indices()

    def set_epoch(self, epoch: int) -> None:
        """Resume-consistent sampling (DDP set_epoch contract): the epoch
        seeds the per-shard permutation, so a resumed run replays the same
        sample order the original would have drawn."""
        self.epoch = int(epoch)

    def __len__(self):
        self._ensure_filled()
        return self._n_per_shard // self._bs_local

    def __iter__(self):
        if self.is_train:
            for key, idx in self._iter_indices():
                yield self._feed(key, self.images, self.labels, idx)
        else:
            for key, idx in self._iter_indices():
                yield self._feed(key, self.images, self.labels, idx, self._valid)

    def _iter_indices(self):
        self._ensure_filled()
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu0 = None
        rng_host = jax.device_put(self.rng, cpu0)
        steps = len(self)
        n_proc = max(jax.process_count(), 1)
        shards_here = max(self._n_data // n_proc, 1)
        if self.is_train:
            # per-shard epoch permutation, seeded by (epoch, GLOBAL shard
            # id) — deterministic and process-layout independent (DDP
            # set_epoch analog, reference train.py:61 via DALI). Each
            # process materializes only its own shards' index rows
            # (make_array assembles the global array).
            first = jax.process_index() * shards_here
            perms = [
                np.random.default_rng((0x5EED, self.epoch, d)).permutation(self._n_per_shard)[: steps * self._bs_local]
                for d in range(first, first + shards_here)
            ]
            self.epoch += 1
        else:
            # exact val: fixed sequential sweep; pads are masked out
            perms = [np.arange(self._n_per_shard)] * shards_here
        for s in range(steps):
            # (shards_here * bs_local,) int32: shard d's row indexes shard
            # d's resident samples; ships with the dispatch (numpy)
            idx = np.concatenate([p[s * self._bs_local : (s + 1) * self._bs_local] for p in perms]).astype(np.int32)
            idx = jax.make_array_from_process_local_data(self._idx_sh, idx)
            self._step += 1
            if cpu0 is not None:
                with jax.default_device(cpu0):
                    key = np.asarray(jax.random.fold_in(rng_host, self._step))
            else:
                key = jax.random.fold_in(rng_host, self._step)
            yield key, idx
