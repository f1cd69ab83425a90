"""Input pipeline: host loaders + device feed + stage manager.

Layering (replaces DALI, reference dali_dataloader.py):

  host loader (synthetic | folder | tfrecord)     — yields uint8 NHWC + int labels
    └─ DeviceFeed: jitted on-device augmentation + sharded device_put + prefetch
         └─ batches {'image': bf16 (B,H,W,3) sharded over mesh 'data', 'label': one-hot}

Per-host sharding replaces per-rank DALI shards (dali_dataloader.py:47,130):
each JAX process reads files[process_index::process_count]; the global batch
is assembled with jax.make_array_from_process_local_data.

DataManager mirrors DaliDataManager (dali_dataloader.py:189-239): progressive
stages rebuild loaders only when `extra_args` change image size/batch/augs;
val image size follows train (dali_dataloader.py:228).
"""

from __future__ import annotations

import math
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from sota_imagenet_tpu.config import ConfigNode, DataStage, parse_stages
from sota_imagenet_tpu.data import decode as D
from sota_imagenet_tpu.ops.augment import build_train_augment, build_val_augment
from sota_imagenet_tpu.parallel.mesh import batch_sharding
from sota_imagenet_tpu.utils.logging import get_logger

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


# --------------------------------------------------------------------------- #
# Host loaders: yield (images_u8 [B,H,W,3], labels int32 [B]) per-host batches
# --------------------------------------------------------------------------- #


class SyntheticLoader:
    """Deterministic fake-data loader for tests/benches (no reference analog —
    SURVEY.md §4 calls out the lack of fake backends as the gap to fix)."""

    def __init__(self, batch_size: int, image_size: int, num_classes: int = 1000, length: int = 32, seed: int = 0):
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_classes = num_classes
        self.length = length
        rng = np.random.default_rng(seed)
        # small pool of fake images reused across batches (keeps host cost ~0)
        self._pool = rng.integers(0, 256, size=(4, batch_size, image_size, image_size, 3), dtype=np.uint8)
        self._labels = rng.integers(0, num_classes, size=(4, batch_size), dtype=np.int32)

    def __len__(self):
        return self.length

    def __iter__(self):
        for i in range(self.length):
            j = i % self._pool.shape[0]
            yield self._pool[j], self._labels[j]


def scan_image_folder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """ImageFolder layout: root/<class>/<img>. Labels by sorted class dirs
    (matches the reference synset->label rule, create_records.py:151-155)."""
    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    files, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(IMG_EXTENSIONS):
                files.append(os.path.join(cdir, fn))
                labels.append(idx)
    return files, labels, classes


class FolderLoader:
    """Parallel host decode over an ImageFolder tree (train or val)."""

    def __init__(
        self,
        root: str,
        *,
        is_train: bool,
        batch_size: int,
        image_size: int,
        min_area: float = 0.08,
        random_interpolation: bool = False,
        interpolation: str = "triangular",
        full_crop: bool = False,
        workers: int = 6,
        seed: int = 42,
        drop_last: bool = True,
        device_resample: bool = False,
    ):
        self.files, self.labels, self.classes = scan_image_folder(root)
        self.is_train = is_train
        # device-resample split (train only): host decodes DCT-scaled crops
        # onto a fixed canvas; the triangular/cubic resample runs on the TPU
        # (ops/resample.py). Batches become (canvas_imgs, labels, meta) with
        # meta = per-sample (sh, sw, filt).
        self.device_resample = bool(device_resample) and is_train
        self.meta_kind = "resample" if self.device_resample else None
        self.batch_size = batch_size
        self.image_size = image_size
        self.min_area = min_area
        self.random_interpolation = random_interpolation
        # base train resize filter (legacy `resize_method: cubic`)
        self.interpolation = interpolation
        self.full_crop = full_crop
        self.workers = max(workers, 1)
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        # per-host shard (replaces shard_id/num_shards, dali_dataloader.py:47)
        pi, pc = jax.process_index(), jax.process_count()
        self.shard_files = self.files[pi::pc]
        self.shard_labels = self.labels[pi::pc]

    def __len__(self):
        n = len(self.shard_files) // self.batch_size
        if not self.drop_last and len(self.shard_files) % self.batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _decode_one(self, path: str, rng: np.random.Generator) -> np.ndarray:
        if self.is_train:
            return D.decode_train(
                path,
                rng,
                self.image_size,
                min_area=self.min_area,
                random_interpolation=self.random_interpolation,
                interpolation=self.interpolation,
            )
        return D.decode_val(path, self.image_size, full_crop=self.full_crop)

    def _batch_executor(self):
        """Native batch executor (one C call per batch) for the train path."""
        if not self.is_train:
            return None
        if not hasattr(self, "_exec"):
            try:
                from sota_imagenet_tpu.data import native

                self._exec = native.BatchExecutor(workers=self.workers) if native.available() else None
            except Exception:
                self._exec = None
        return self._exec

    def _submit_batch_native(self, idxs, rngs) -> Optional[tuple]:
        """Read bytes + sample crops + submit to the C executor; non-blocking.
        Returns (ticket, filts) — filts feed the device-resample meta (the C
        resize uses them directly in host-resample mode)."""
        from sota_imagenet_tpu.data import native

        ex = self._batch_executor()
        if ex is None:
            return None
        datas, crops, filts = [], [], []
        for i, rng in zip(idxs, rngs):
            with open(self.shard_files[i], "rb") as f:
                data = f.read()
            dims = native.jpeg_dims(data)
            if dims is None:
                crops.append((0, 0, 1, 1))  # will fail in C -> PIL fallback below
            else:
                crops.append(D.sample_random_crop(rng, dims[0], dims[1], min_area=self.min_area))
            datas.append(data)
            base = native.FILT_CUBIC if self.interpolation == "cubic" else native.FILT_TRIANGULAR
            filts.append((1 - base) if (self.random_interpolation and rng.random() < 0.5) else base)
        if self.device_resample:
            canvas = D.resample_canvas(self.image_size)
            return ex.submit_scaled(datas, crops, self.image_size, canvas), filts
        return ex.submit(datas, crops, filts, (self.image_size, self.image_size)), filts

    def _wait_batch_native(self, ticket, idxs, filts):
        """Returns imgs (host-resample mode) or (imgs, meta) (device-resample
        mode). Rare non-JPEGs are PIL-redecoded in place."""
        if self.device_resample:
            imgs, failed, dims = self._exec.wait_scaled(ticket)
            meta = np.concatenate([dims, np.asarray(filts, np.int32)[:, None]], axis=1)
            for fi in failed:
                img, sh, sw, filt = D.decode_train_scaled(
                    self.shard_files[idxs[fi]],
                    np.random.default_rng((self.seed, self.epoch, int(idxs[fi]), 1)),
                    self.image_size,
                    min_area=self.min_area,
                    random_interpolation=self.random_interpolation,
                    interpolation=self.interpolation,
                    use_native=False,
                )
                imgs[fi] = img
                meta[fi] = (sh, sw, filt)
            return imgs, meta
        imgs, failed = self._exec.wait(ticket)
        for fi in failed:  # rare non-JPEGs: PIL fallback
            imgs[fi] = D.decode_train(
                self.shard_files[idxs[fi]],
                np.random.default_rng((self.seed, self.epoch, int(idxs[fi]), 1)),
                self.image_size,
                min_area=self.min_area,
                random_interpolation=self.random_interpolation,
                interpolation=self.interpolation,
                use_native=False,
            )
        return imgs

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.shard_files))
        if self.is_train:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        bs = self.batch_size
        n_batches = len(self)

        def batch_idxs(b):
            idxs = order[b * bs : (b + 1) * bs]
            return idxs, [np.random.default_rng((self.seed, self.epoch, int(i))) for i in idxs]

        use_native = self.is_train and self._batch_executor() is not None
        with ThreadPoolExecutor(self.workers) as pool:
            # double-buffered native path: batch b+1 decodes in C while batch b
            # is post-processed/consumed (DALI-style pipelining)
            pending = None  # ((ticket, filts), idxs)
            if use_native and n_batches:
                idxs0, rngs0 = batch_idxs(0)
                pending = (self._submit_batch_native(idxs0, rngs0), idxs0)
            for b in range(n_batches):
                meta = None
                if use_native:
                    (ticket, filts), idxs = pending
                    if b + 1 < n_batches:
                        idxs1, rngs1 = batch_idxs(b + 1)
                        pending = (self._submit_batch_native(idxs1, rngs1), idxs1)
                    got = self._wait_batch_native(ticket, idxs, filts)
                    stacked, meta = got if self.device_resample else (got, None)
                elif self.device_resample:
                    idxs, rngs = batch_idxs(b)
                    parts = list(
                        pool.map(
                            lambda a: D.decode_train_scaled(
                                self.shard_files[a[0]],
                                a[1],
                                self.image_size,
                                min_area=self.min_area,
                                random_interpolation=self.random_interpolation,
                                interpolation=self.interpolation,
                            ),
                            zip(idxs, rngs),
                        )
                    )
                    stacked = np.stack([p[0] for p in parts])
                    meta = np.asarray([p[1:] for p in parts], np.int32)
                else:
                    idxs, rngs = batch_idxs(b)
                    imgs = list(pool.map(lambda a: self._decode_one(self.shard_files[a[0]], a[1]), zip(idxs, rngs)))
                    stacked = np.stack(imgs)
                n_real = stacked.shape[0]
                if n_real < bs:  # pad tail batch (only when drop_last=False)
                    pad = np.repeat(stacked[-1:], bs - n_real, axis=0)
                    stacked = np.concatenate([stacked, pad])
                    if meta is not None:  # keep batch dims consistent for DeviceFeed
                        meta = np.concatenate([meta, np.repeat(meta[-1:], bs - n_real, axis=0)])
                labels = np.asarray([self.shard_labels[i] for i in idxs], dtype=np.int32)
                if len(labels) < bs:
                    labels = np.concatenate([labels, np.full(bs - len(labels), -1, np.int32)])
                if meta is not None:
                    yield stacked, labels, meta
                elif not self.drop_last:
                    # padded samples carry mask 0 so the masked eval path
                    # (steps.build_eval_step) scores them as absent, not wrong.
                    # The mask is yielded for FULL batches too — a mixed
                    # 2-/3-tuple stream would compile two eval graphs.
                    mask = np.zeros((bs,), np.float32)
                    mask[:n_real] = 1.0
                    yield stacked, labels, mask
                else:
                    yield stacked, labels
        self.epoch += 1


# --------------------------------------------------------------------------- #
# Device feed
# --------------------------------------------------------------------------- #


class RectValLoader:
    """Rectangular validation (closes the reference's TODO,
    dali_dataloader.py:5): images are grouped by aspect ratio into THREE
    static shapes (tall/square/wide center crops at near-native aspect), so
    jit compiles exactly three eval graphs. Every image is evaluated exactly
    once: the last batch of each bucket is zero-padded and carries a sample
    mask the eval step uses for exact weighted metrics."""

    # (path, mtime) -> (w, h) header cache, shared across stage rebuilds (the
    # bucket THRESHOLDS depend on image_size, but the image dimensions do
    # not). Keyed by mtime so replacing a val file within a process is seen.
    _WH_CACHE: Dict[Tuple[str, float], Tuple[int, int]] = {}
    _SIDECAR = ".rectval_wh.json"  # persisted (w, h) table next to the dataset

    def __init__(self, root: str, *, batch_size: int, image_size: int, workers: int = 6, **_):
        import json

        from PIL import Image

        self.files, self.labels, self.classes = scan_image_folder(root)
        self.batch_size = batch_size
        self.image_size = image_size
        self.workers = max(workers, 1)
        self.buckets, thresh = D.rect_buckets(image_size)
        # bucket the FULL (sorted) file list identically on every process:
        # per-process bucketing of a shard would give processes different
        # batch counts and shape sequences, breaking the collective global
        # batch assembly on pods. Header reads are parallel + cached, and the
        # table persists to a sidecar so pod-wide first-epoch startup is one
        # full-dataset metadata scan TOTAL, not one per host per process.
        cache = RectValLoader._WH_CACHE
        sidecar = os.path.join(root, RectValLoader._SIDECAR)
        try:
            with open(sidecar) as f:
                for rel, (w, h, mt) in json.load(f).items():
                    cache[(os.path.join(root, rel), float(mt))] = (int(w), int(h))
        except (OSError, ValueError):
            pass
        keys = [(f, os.path.getmtime(f)) for f in self.files]
        missing = [k for k in keys if k not in cache]
        if missing:

            def read_wh(key):
                with Image.open(key[0]) as im:  # header-only read
                    return im.size

            with ThreadPoolExecutor(self.workers) as pool:
                for k, wh in zip(missing, pool.map(read_wh, missing)):
                    cache[k] = wh
            if jax.process_index() == 0:
                try:  # atomic write; losing the race is harmless (same content)
                    table = {os.path.relpath(f, root): [*cache[(f, mt)], mt] for f, mt in keys}
                    tmp = sidecar + f".tmp{os.getpid()}"
                    with open(tmp, "w") as out:
                        json.dump(table, out)
                    os.replace(tmp, sidecar)
                except OSError:
                    pass
        self.by_bucket = {k: [] for k in self.buckets}
        for (f, mt), lab in zip(keys, self.labels):
            w, h = cache[(f, mt)]
            self.by_bucket[D.bucket_of(w, h, thresh)].append((f, lab))
        # each process takes an interleaved shard of every bucket, padded to a
        # globally-identical batch count (trailing batches may be all-padding
        # on some processes; the sample mask keeps the metrics exact)
        pi, pc = jax.process_index(), jax.process_count()
        self.my_bucket = {k: items[pi::pc] for k, items in self.by_bucket.items()}
        self.batches_per_bucket = {
            k: math.ceil(math.ceil(len(items) / pc) / batch_size) if items else 0
            for k, items in self.by_bucket.items()
        }

    def __len__(self):
        return sum(self.batches_per_bucket.values())

    def set_epoch(self, epoch: int) -> None:
        pass

    def __iter__(self):
        bs = self.batch_size
        with ThreadPoolExecutor(self.workers) as pool:
            for name, hw in self.buckets.items():
                items = self.my_bucket[name]
                for i in range(self.batches_per_bucket[name]):
                    chunk = items[i * bs : (i + 1) * bs]
                    imgs = list(pool.map(lambda it: D.decode_val_rect(it[0], self.image_size, hw), chunk))
                    n = len(chunk)
                    images = np.zeros((bs, hw[0], hw[1], 3), np.uint8)
                    if n:
                        images[:n] = np.stack(imgs)
                    labels = np.zeros((bs,), np.int64)
                    labels[:n] = [it[1] for it in chunk]
                    mask = np.zeros((bs,), np.float32)
                    mask[:n] = 1.0
                    yield images, labels, mask


class DeviceFeed:
    """Wraps a host loader: device-side augment + sharded transfer + prefetch.

    The returned iterator yields fully-sharded device batches; with
    ``prefetch`` > 0 the next batch's transfer+augment is dispatched before the
    current one is consumed, hiding host latency behind device compute (the
    DALI worker-thread role, SURVEY.md §2.3).
    """

    def __init__(
        self,
        host_loader,
        mesh,
        augment_fn,
        rng: Optional[jax.Array] = None,
        prefetch: int = 2,
        label_divisor: int = 1,
    ):
        self.host = host_loader
        self.mesh = mesh
        self.augment = augment_fn
        if rng is None:
            from sota_imagenet_tpu.utils.misc import host_prng_key

            # host-resident by construction: deriving per-batch keys must
            # never read back from the accelerator (PERF.md round 4 — D2H
            # through a tunnel costs a ~30 ms round trip; on real TPU VMs
            # it serializes dispatch)
            rng = host_prng_key(0)
        self.rng = rng
        self.prefetch = max(prefetch, 1)
        # legacy `classes_divisor` (see config.LoaderConfig): merge every
        # `label_divisor` consecutive labels; -1 pad labels stay -1
        self.label_divisor = max(int(label_divisor), 1)
        self._step = 0

    @property
    def batch_size(self):
        return self.host.batch_size

    def __len__(self):
        return len(self.host)

    def __iter__(self):
        sh = batch_sharding(self.mesh)

        meta_kind = getattr(self.host, "meta_kind", None)
        # per-batch key derivation runs on the HOST cpu backend: fold_in is an
        # eager op, and on a tunneled TPU an eager dispatch costs a host round
        # trip per batch (~35 ms measured) — the 8-byte key transfers with the
        # augment dispatch instead
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
            if isinstance(self.rng, jax.Array) and next(iter(self.rng.devices())).platform != "cpu":
                # accelerator-resident key: moving it host-side is a D2H
                # readback the steady-state loop should never pay (PERF.md
                # round 4). Pass numpy / a host key
                # (utils.misc.host_prng_key) to avoid this path.
                get_logger().warning("DeviceFeed rng is device-resident; reading it back once (pass utils.misc.host_prng_key instead)")
            rng_host = jax.device_put(self.rng, cpu0)
        except RuntimeError:
            cpu0, rng_host = None, self.rng

        def produce(item):
            images_u8, labels = item[0], item[1]
            if self.label_divisor > 1:
                labels = np.where(labels >= 0, labels // self.label_divisor, labels)
            g_img = jax.make_array_from_process_local_data(sh, images_u8)
            g_lab = jax.make_array_from_process_local_data(sh, labels)
            self._step += 1
            if cpu0 is not None:
                with jax.default_device(cpu0):
                    # -> numpy: an uncommitted argument, so it composes with
                    # sharded inputs and ships with the augment dispatch
                    key = np.asarray(jax.random.fold_in(rng_host, self._step))
            else:
                key = jax.random.fold_in(self.rng, self._step)
            if len(item) > 2 and meta_kind == "resample":
                # device-resample split: per-sample (sh, sw, filt) rides along
                g_meta = jax.make_array_from_process_local_data(sh, item[2])
                return self.augment(key, g_img, g_lab, g_meta)
            batch = self.augment(key, g_img, g_lab)
            if len(item) > 2:  # masked val: per-sample validity mask
                batch["mask"] = jax.make_array_from_process_local_data(sh, item[2])
            return batch

        # background producer: host decode keeps running while the consumer
        # is busy (dispatching steps / evaluating) — the DALI worker-thread
        # role (SURVEY.md §3.1 hot loop (2))
        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self.host:
                    if not _put(item):
                        return  # consumer abandoned the epoch (e.g. debug mode)
                _put(_END)
            except BaseException as e:  # surface decode errors to the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        pending = []
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                pending.append(produce(item))
                if len(pending) > self.prefetch:
                    yield pending.pop(0)
            for p in pending:
                yield p
        finally:
            stop.set()


# --------------------------------------------------------------------------- #
# DataManager (reference DaliDataManager, dali_dataloader.py:189-239)
# --------------------------------------------------------------------------- #


def _build_host_loader(loader_cfg: ConfigNode, is_train: bool):
    backend = loader_cfg.get("backend", "auto")
    root = loader_cfg.get("root_data_dir", "")
    if backend == "auto":
        if loader_cfg.get("use_packed", False):
            backend = "packed"
        elif loader_cfg.get("use_tfrecords", False):
            backend = "tfrecord"
        elif root and os.path.isdir(os.path.join(root, "train" if is_train else "val")):
            backend = "folder"
        else:
            backend = "synthetic"
    if backend == "synthetic":
        return SyntheticLoader(
            batch_size=loader_cfg.batch_size // max(jax.process_count(), 1),
            image_size=loader_cfg.image_size,
            num_classes=loader_cfg.num_classes,
        )
    if backend == "folder":
        if not is_train and loader_cfg.get("rectangular", False):
            return RectValLoader(
                os.path.join(root, "val"),
                batch_size=loader_cfg.batch_size // max(jax.process_count(), 1),
                image_size=loader_cfg.image_size,
                workers=loader_cfg.get("workers", 6),
            )
        return FolderLoader(
            os.path.join(root, "train" if is_train else "val"),
            is_train=is_train,
            batch_size=loader_cfg.batch_size // max(jax.process_count(), 1),
            image_size=loader_cfg.image_size,
            min_area=loader_cfg.get("min_area", 0.08),
            random_interpolation=loader_cfg.get("random_interpolation", False),
            interpolation=loader_cfg.get("interpolation", "triangular"),
            full_crop=loader_cfg.get("full_crop", False),
            workers=loader_cfg.get("workers", 6),
            # val evaluates EVERY image: tail batch is padded + masked so the
            # metrics stay exact (the reference sidestepped this with a batch-
            # divisibility requirement, arg_parser.py:59-61)
            drop_last=is_train,
            device_resample=is_train and bool(loader_cfg.get("device_resample", False)),
        )
    if backend == "packed":
        from sota_imagenet_tpu.data.packed import PackedLoader

        return PackedLoader(
            root,
            is_train=is_train,
            batch_size=loader_cfg.batch_size // max(jax.process_count(), 1),
            image_size=loader_cfg.image_size,
            workers=loader_cfg.get("workers", 6),
            drop_last=is_train,  # val: pad + mask the tail (see FolderLoader)
        )
    if backend == "tfrecord":
        from sota_imagenet_tpu.data.records import TFRecordLoader

        return TFRecordLoader(
            root,
            is_train=is_train,
            batch_size=loader_cfg.batch_size // max(jax.process_count(), 1),
            image_size=loader_cfg.image_size,
            min_area=loader_cfg.get("min_area", 0.08),
            random_interpolation=loader_cfg.get("random_interpolation", False),
            interpolation=loader_cfg.get("interpolation", "triangular"),
            full_crop=loader_cfg.get("full_crop", False),
            workers=loader_cfg.get("workers", 6),
            drop_last=is_train,  # val: pad + mask the tail (see FolderLoader)
            device_resample=is_train and bool(loader_cfg.get("device_resample", False)),
        )
    raise ValueError(f"unknown data backend {backend!r}")


def build_loader(loader_cfg: ConfigNode, mesh, is_train: bool, rng=None, out_dtype=None):
    if not is_train and loader_cfg.get("device_cache", False) and loader_cfg.get("rectangular", False):
        # RectValLoader yields aspect-bucketed batches of 3 different static
        # shapes — a single fixed-shape HBM cache can't hold them. Reject
        # BEFORE building the host loader (RectVal scans the whole val tree).
        raise ValueError(
            "val_loader.device_cache is incompatible with val_loader.rectangular "
            "(the cache stores one fixed shape; use the square masked val or drop device_cache)"
        )
    host = _build_host_loader(loader_cfg, is_train)
    import jax.numpy as jnp

    dtype = out_dtype or jnp.bfloat16
    # legacy classes_divisor: labels are merged host-side (DeviceFeed), so the
    # one-hot width shrinks to the effective class count
    divisor = max(int(loader_cfg.get("classes_divisor", 1) or 1), 1)
    eff_classes = -(-int(loader_cfg.num_classes) // divisor)
    if is_train:
        aug = build_train_augment(
            num_classes=eff_classes,
            resample_to=(
                loader_cfg.image_size
                if getattr(host, "device_resample", False) or getattr(host, "meta_kind", None) == "resample"
                else None
            ),
            blur_prob=loader_cfg.get("blur_prob", 0.0),
            gray_prob=loader_cfg.get("gray_prob", 0.0),
            color_twist_prob=loader_cfg.get("color_twist_prob", 0.0),
            contrast_range=tuple(loader_cfg.get("contrast_range", (0.7, 1.3))),
            brightness_range=tuple(loader_cfg.get("brightness_range", (0.7, 1.3))),
            re_prob=loader_cfg.get("re_prob", 0.0),
            re_count=loader_cfg.get("re_count", 3),
            out_dtype=dtype,
        )
    else:
        aug = build_val_augment(num_classes=eff_classes, out_dtype=dtype)
    if loader_cfg.get("device_cache", False):
        from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed

        return DeviceCacheFeed(
            host,
            mesh,
            aug,
            rng=rng,
            label_divisor=divisor,
            is_train=is_train,
            fill_chunk_mb=loader_cfg.get("fill_chunk_mb", 256),
        )
    return DeviceFeed(host, mesh, aug, rng=rng, prefetch=loader_cfg.get("prefetch", 2), label_divisor=divisor)


class DataManager:
    """Stage-based loader rebuild for progressive training
    (reference DaliDataManager, dali_dataloader.py:189-239)."""

    def __init__(self, cfg: ConfigNode, mesh, rng=None, out_dtype=None):
        self.cfg = cfg
        self.mesh = mesh
        self.rng = rng
        self.out_dtype = out_dtype
        self.stages: List[DataStage] = parse_stages(cfg.run.stages)
        self.tot_epochs = max(s.end for s in self.stages)
        self.loader = None
        self.val_loader = None
        self.start_epoch: Optional[int] = None
        self.end_epoch: Optional[int] = None

    def __len__(self):
        return len(self.stages)

    def set_stage(self, idx: int) -> None:
        import copy

        stage = self.stages[idx]
        self.start_epoch = stage.start
        self.end_epoch = stage.end
        if stage.extra_args is None and self.loader is not None:
            return  # only lr changed (dali_dataloader.py:217-218)
        train_cfg = copy.deepcopy(self.cfg.loader)
        val_cfg = copy.deepcopy(self.cfg.val_loader)
        if stage.extra_args is not None:
            for k, v in dict(stage.extra_args).items():
                train_cfg[k] = v
        # reference semantics: accumulate_steps MULTIPLIES the effective batch
        # (the torch runner accumulated across loader batches); here the step
        # scans microbatches of the configured size within one larger batch
        accum = int(self.cfg.run.get("accumulate_steps", 1) or 1)
        if accum > 1:
            train_cfg["batch_size"] = int(train_cfg["batch_size"]) * accum
        if val_cfg.get("follow_train_size", True):
            val_cfg["image_size"] = train_cfg["image_size"]  # val follows train (dali_dataloader.py:228)
        # legacy classes_divisor applies to the whole run — val labels are
        # merged the same way so metrics live in the shrunken label space
        val_cfg["classes_divisor"] = train_cfg.get("classes_divisor", 1)
        get_logger().info(f"Loader changed. New data config: image_size={train_cfg['image_size']} batch_size={train_cfg['batch_size']}")
        self.loader = build_loader(train_cfg, self.mesh, is_train=True, rng=self.rng, out_dtype=self.out_dtype)
        self.val_loader = build_loader(val_cfg, self.mesh, is_train=False, out_dtype=self.out_dtype)
