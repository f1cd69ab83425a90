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
        fill_chunk_mb: int = 256,
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
        self.fill_chunk_mb = float(fill_chunk_mb)  # fractional MB allowed (tests)
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

    # ---- fill machinery -------------------------------------------------
    #
    # Shard routing (both fill paths): filtered stream row i lives on data
    # shard i % S at position i // S. Under the train drop-last convention
    # (n_per = n_valid // S) the sampled rows p*S+d, p < n_per are exactly
    # stream rows [0, n_per*S) — the SAME rows a contiguous-block layout
    # keeps — and the routing of a chunk is known the moment it arrives,
    # which is what lets the chunked path stream into a preallocated sharded
    # buffer with transient host RSS of ~one chunk (round-4 VERDICT #5: the
    # monolithic path held 2-3x the whole process shard in host RAM and
    # shipped it as one opaque transfer).

    def _ensure_filled(self) -> None:
        if self.images is not None:
            return
        host_loader, self._host = self._host, None
        t0 = time.perf_counter()
        if self.fill_chunk_mb > 0:
            filled_mb = self._fill_chunked(host_loader)
        else:
            filled_mb = self._fill_monolithic(host_loader)
        fill_s = time.perf_counter() - t0
        n_proc = max(jax.process_count(), 1)
        shards_here = max(self._n_data // n_proc, 1)
        get_logger().info(
            f"Device cache: {self._n_per_shard} x {self._n_data} samples "
            f"({filled_mb * n_proc:.0f} MB global, {filled_mb / shards_here:.0f} MB/device-shard) "
            f"filled in {fill_s:.1f}s over data={self._n_data} "
            f"({'chunked ' + str(self.fill_chunk_mb) + ' MB' if self.fill_chunk_mb > 0 else 'monolithic'})"
        )
        self._build_gathers()

    @staticmethod
    def _interleave(arr: np.ndarray, shards: int) -> np.ndarray:
        """Rearrange rows so global position d*n_per + p holds stream row
        p*shards + d (rows must be a multiple of shards)."""
        n_per = arr.shape[0] // shards
        return np.ascontiguousarray(
            arr.reshape(n_per, shards, *arr.shape[1:]).swapaxes(0, 1)
        ).reshape(arr.shape[0], *arr.shape[1:])

    def _harmonized_n_per(self, n_per: int) -> int:
        """Every process must contribute identical local shapes, or the
        assembled global arrays / step counts diverge and the pod hangs at
        the first collective. Harmonize instead of failing: train trims to
        the global MIN (DDP drop-last analog); val pads to the global MAX
        (pads are masked — exactness preserved)."""
        if max(jax.process_count(), 1) == 1:
            return n_per
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(np.asarray([n_per]))
        lo, hi = int(counts.min()), int(counts.max())
        if lo != hi:
            get_logger().warning(
                f"device_cache per-shard counts differ across processes {counts.ravel().tolist()}: "
                + ("trimming to the min (drop-last)" if self.is_train else "padding to the max (masked)")
            )
        return lo if self.is_train else hi

    def _filter_item(self, item):
        """(imgs, labs[, mask]) host batch -> valid rows only, labels divided.

        Drops masked pad rows at fill (3-tuple host loaders pad the tail
        batch with validity 0 / label -1 — caching those would train on
        all-zero one-hots)."""
        imgs, labs = item[0], np.asarray(item[1]).astype(np.int32)
        valid = (item[2] > 0.5) if len(item) > 2 else None
        if valid is not None and not valid.all():
            imgs, labs = imgs[valid], labs[valid]
        if self.label_divisor > 1:
            labs = np.where(labs >= 0, labs // self.label_divisor, labs)
        return imgs, labs

    def _val_n_per(self, n_valid: int, shards_here: int) -> int:
        """EXACT val quota: every real sample once, shards padded UP to a
        uniform multiple of the per-device batch."""
        q = -(-n_valid // shards_here)  # ceil: per-shard quota
        return -(-q // self._bs_local) * self._bs_local  # full device batches

    def _oom_hint(self, e: Exception, bytes_per_shard: float):
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            return RuntimeError(
                f"loader.device_cache does not fit: {bytes_per_shard / 1e9:.2f} GB/device-shard of "
                f"images (+activations/params/optimizer). Shard over more chips (mesh.data), cache a "
                f"pre-resized smaller tree, or fall back to streaming (loader.use_packed without device_cache)."
            )
        return None

    def _fill_monolithic(self, host_loader) -> float:
        """Whole-shard fill in one transfer (fill_chunk_mb: 0). Simple and
        fine at the few-hundred-MB scale; holds 2-3x the process shard in
        host RAM transiently — prefer the chunked default beyond that."""
        mesh = self.mesh
        imgs_l, labs_l = [], []
        for item in host_loader:
            i, l = self._filter_item(item)
            imgs_l.append(i)
            labs_l.append(l)
        if not imgs_l:
            raise ValueError(
                "loader.device_cache: the host loader yielded no batches on this process "
                "(empty data shard?) — the cache cannot even infer the image shape"
            )
        imgs = np.concatenate(imgs_l, axis=0)
        labs = np.concatenate(labs_l, axis=0)
        del imgs_l, labs_l
        n_proc = max(jax.process_count(), 1)
        shards_here = max(self._n_data // n_proc, 1)  # data shards this process feeds
        if self.is_train:
            n_per = self._harmonized_n_per(imgs.shape[0] // shards_here)
            keep = n_per * shards_here
            imgs, labs = imgs[:keep], labs[:keep]
        else:
            n_per = self._harmonized_n_per(self._val_n_per(imgs.shape[0], shards_here))
            # pads carry label -1 and validity 0 so the weighted metrics
            # ignore them (same contract as the masked streaming val);
            # zero-filled images match the chunked path's buffer init
            total = n_per * shards_here
            validity = np.zeros((total,), np.float32)
            validity[: imgs.shape[0]] = 1.0
            pad = total - imgs.shape[0]
            if pad:
                imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
                labs = np.concatenate([labs, np.full(pad, -1, np.int32)])
            validity = self._interleave(validity, shards_here)
        self._n_per_shard = n_per
        imgs = self._interleave(imgs, shards_here)
        labs = self._interleave(labs, shards_here)

        sh = NamedSharding(mesh, P("data"))
        try:
            self.images = jax.make_array_from_process_local_data(sh, imgs)
        except Exception as e:  # XlaRuntimeError has no stable class across backends
            hint = self._oom_hint(e, imgs.nbytes / shards_here)
            if hint:
                raise hint from e
            raise
        self.labels = jax.make_array_from_process_local_data(sh, labs)
        self._valid = (
            None if self.is_train else jax.make_array_from_process_local_data(sh, validity)
        )
        return imgs.nbytes / 1e6

    def _fill_chunked(self, host_loader) -> float:
        """Streamed fill: host batches are filtered, buffered to ~one chunk,
        interleaved to shard-major order and written into a PREALLOCATED
        sharded uint8 buffer with a donated dynamic_update_slice program.
        Transient host RSS ~= one chunk (default 256 MB) instead of 2-3x the
        process shard; progress is logged; every process runs the same
        number of write rounds (upper-bounded from len(host_loader)), so a
        multi-process pod stays in lockstep even with ragged shards."""
        from jax import shard_map

        mesh = self.mesh
        n_proc = max(jax.process_count(), 1)
        shards_here = max(self._n_data // n_proc, 1)

        it = iter(host_loader)
        try:
            first = next(it)
        except StopIteration:
            raise ValueError(
                "loader.device_cache: the host loader yielded no batches on this process "
                "(empty data shard?) — the cache cannot even infer the image shape"
            )
        img_shape = tuple(first[0].shape[1:])
        row_bytes = int(np.prod(img_shape))  # uint8
        # upper bound on this process's rows: every host batch full-sized
        n_up = len(host_loader) * host_loader.batch_size
        if n_proc > 1:
            from jax.experimental import multihost_utils

            n_up = int(multihost_utils.process_allgather(np.asarray([n_up])).max())
        # chunk sized to fill_chunk_mb, a multiple of shards_here, and no
        # larger than the (shard-rounded) dataset itself
        chunk_bytes = max(1, int(self.fill_chunk_mb * (1 << 20)))
        chunk_rows = max(1, chunk_bytes // row_bytes // shards_here) * shards_here
        chunk_rows = min(chunk_rows, -(-n_up // shards_here) * shards_here)
        k = chunk_rows // shards_here  # rows per shard per write round
        n_rounds = -(-n_up // chunk_rows)
        cap = n_rounds * k  # per-shard buffer capacity

        sh = NamedSharding(mesh, P("data"))
        try:
            # local until the fill completes: a failed fill must not leave a
            # half-built cache that _ensure_filled would treat as done
            imgs_buf = jax.jit(
                lambda: jnp.zeros((self._n_data * cap,) + img_shape, jnp.uint8), out_shardings=sh
            )()
            labs_buf = jax.jit(lambda: jnp.full((self._n_data * cap,), -1, jnp.int32), out_shardings=sh)()
        except Exception as e:
            hint = self._oom_hint(e, float(cap) * row_bytes)
            if hint:
                raise hint from e
            raise

        def _upd(buf, chunk, start):
            return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)

        write = jax.jit(
            shard_map(_upd, mesh=mesh, in_specs=(P("data"), P("data"), P()), out_specs=P("data")),
            donate_argnums=(0,),
        )

        chunk_sh = NamedSharding(mesh, P("data"))
        # incoming rows scatter straight into ONE reusable chunk buffer in
        # interleaved (shard-major) order — no batch list, no concatenate,
        # no separate interleave copy: transient host RSS ~= 2x one chunk
        # (this buffer + make_array's device-side copy), measured by
        # scripts/bench_cache_fill.py. dest[j] = position of chunk-local
        # stream offset j (stream row r*chunk_rows + j).
        j = np.arange(chunk_rows)
        dest = (j % shards_here) * k + j // shards_here
        chunk_i = np.zeros((chunk_rows,) + img_shape, np.uint8)
        chunk_l = np.full((chunk_rows,), -1, np.int32)
        fill_pos = 0  # chunk-local stream offset already placed
        carry = None  # remainder of a batch straddling the chunk boundary
        n_valid = 0
        done = False
        t0 = time.perf_counter()

        def _flush(r):
            nonlocal fill_pos, imgs_buf, labs_buf
            if fill_pos < chunk_rows:  # partial/pad chunk: zero image, label -1
                tail = dest[fill_pos:]
                chunk_i[tail] = 0
                chunk_l[tail] = -1
            g_i = jax.make_array_from_process_local_data(chunk_sh, chunk_i)
            g_l = jax.make_array_from_process_local_data(chunk_sh, chunk_l)
            imgs_buf = write(imgs_buf, g_i, r * k)
            labs_buf = write(labs_buf, g_l, r * k)
            fill_pos = 0

        r = 0
        log_every = max(1, n_rounds // 10)
        while r < n_rounds:
            while not done and fill_pos < chunk_rows:
                if carry is not None:
                    imgs, labs = carry
                    carry = None
                else:
                    item = first if first is not None else next(it, None)
                    first = None
                    if item is None:
                        done = True
                        break
                    imgs, labs = self._filter_item(item)
                    n_valid += imgs.shape[0]
                take = min(chunk_rows - fill_pos, imgs.shape[0])
                d = dest[fill_pos : fill_pos + take]
                chunk_i[d] = imgs[:take]
                chunk_l[d] = labs[:take]
                fill_pos += take
                if take < imgs.shape[0]:
                    carry = (imgs[take:], labs[take:])
            if done and fill_pos == 0 and n_proc == 1:
                break  # all data written; remaining capacity keeps its init
            # a process whose data ran out early keeps writing pad chunks so
            # a multi-process pod stays in lockstep across the write programs
            _flush(r)
            r += 1
            if r % log_every == 0 or r == n_rounds:
                mb = n_valid * row_bytes / 1e6
                rate = mb / max(time.perf_counter() - t0, 1e-9)
                get_logger().info(
                    f"Device cache fill: round {r}/{n_rounds}, {n_valid} rows "
                    f"({mb:.0f} MB, {rate:.0f} MB/s)"
                )

        if self.is_train:
            n_per = self._harmonized_n_per(n_valid // shards_here)
        else:
            n_per = self._harmonized_n_per(self._val_n_per(n_valid, shards_here))
            # validity: rows [0, n_valid) of the stream are real; everything
            # beyond (our pads + unwritten capacity) is masked. Built
            # host-side (tiny: 4 bytes/row), same interleaved layout.
            v = np.zeros((cap * shards_here,), np.float32)
            v[:n_valid] = 1.0  # stream rows [0, n_valid) are real
            self._valid = jax.make_array_from_process_local_data(sh, self._interleave(v, shards_here))
        if n_per > cap:
            raise AssertionError(f"device_cache fill accounting: n_per {n_per} > capacity {cap}")
        self._n_per_shard = n_per
        jax.block_until_ready(imgs_buf)
        self.images, self.labels = imgs_buf, labs_buf
        return n_valid * row_bytes / 1e6

    def _build_gathers(self) -> None:
        mesh = self.mesh

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

    def input_cost_fraction(self, step_fn, state, rng) -> dict:
        """COMPILED-COST attribution of the input stage inside the fused
        program: the fraction of the one dispatched program's flops / HBM
        bytes that the gather+augment contributes (XLA HLO cost analysis on
        the lowered modules — no backend compile, no execution).

        This is the honest fused-mode complement to the per-epoch
        ``input_utilization`` host-wait proxy (train/loop.py): with one
        fused program there IS no host wait to measure, so input health is
        a cost share of the compiled step, not a stall fraction. The cost
        model reads the unoptimized HLO (pre-fusion), so it slightly
        overstates the input share — an upper bound, which is the right
        direction for a health indicator."""
        self._ensure_filled()
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        idx = jax.ShapeDtypeStruct((self.batch_size,), jnp.int32, sharding=self._idx_sh)
        ga = self.gather_augment

        def _cost(lowered):
            # Lowered.cost_analysis() is a local-client HLO pass; the axon
            # tunnel's TPU client returns None for it (observed round 5).
            # Fall back to the compiled executable's cost properties —
            # the compile is cached, and the fused program is about to be
            # compiled for training anyway.
            c = lowered.cost_analysis()
            if not c:
                c = lowered.compile().cost_analysis()
            if isinstance(c, (list, tuple)):  # some backends wrap in a list
                c = c[0] if c else None
            if not c:
                raise RuntimeError("HLO cost analysis unavailable on this backend")
            return c

        ga_cost = _cost(jax.jit(ga).lower(key, self.images, self.labels, idx))
        fused_cost = _cost(
            jax.jit(lambda s, k, i, im, lb, r: step_fn(s, ga(k, im, lb, i), r)).lower(
                state, key, idx, self.images, self.labels, rng
            )
        )
        out = {}
        for name, k in (("flops", "flops"), ("bytes", "bytes accessed")):
            num, den = float(ga_cost.get(k, 0.0)), float(fused_cost.get(k, 0.0))
            out[name] = num / den if den > 0 else 0.0
        return out

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
