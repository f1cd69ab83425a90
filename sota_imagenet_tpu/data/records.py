"""TFRecord sharding + reading (reference create_records.py + the DALI
TFRecord reader path, dali_dataloader.py:48-62).

Self-contained: the TFRecord framing (length + masked crc32c + payload) and
the tf.train.Example proto subset (bytes_list / int64_list features) are
implemented directly — no TensorFlow import on the hot path. crc32c comes
from the google_crc32c wheel.

Layout produced (matches what the reference's DALI reader consumes):
    <out>/train_records/train-00000-of-00128 ... + <out>/train_indexes/*.idx
    <out>/val_records/val-00000-of-00016     ... + <out>/val_indexes/*.idx
Index files are DALI `tfrecord2idx` format: "<offset> <size>\n" per record.

Sharding rules mirror the reference: deterministic shuffle with seed 42
(create_records.py:37), 128 train / 16 val shards (:55-56), known-broken
CMYK/PNG files re-encoded as JPEG q95 (:70-91), labels from sorted train
synset dirs (:151-155).
"""

from __future__ import annotations

import io
import os
import shutil
import struct
from multiprocessing import Pool
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)

except ImportError:  # pragma: no cover - slow pure-python fallback
    _CRC_TABLE = None

    def _crc32c(data: bytes) -> int:
        global _CRC_TABLE
        if _CRC_TABLE is None:
            poly = 0x82F63B78
            _CRC_TABLE = []
            for i in range(256):
                c = i
                for _ in range(8):
                    c = (c >> 1) ^ poly if c & 1 else c >> 1
                _CRC_TABLE.append(c)
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# --------------------------------------------------------------------------- #
# Minimal tf.train.Example proto (bytes_list/int64_list subset)
# --------------------------------------------------------------------------- #


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _field(num: int, wire: int) -> bytes:
    return _varint(num << 3 | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def encode_example(features: Dict[str, object]) -> bytes:
    """Encode {name: bytes|int|list[int]} as a tf.train.Example."""
    feats = b""
    for key, value in features.items():
        if isinstance(value, (bytes, bytearray)):
            # Feature{ bytes_list=1 { value=1 } }
            inner = _len_delim(1, _len_delim(1, bytes(value)))
        else:
            vals = value if isinstance(value, (list, tuple)) else [value]
            packed = b"".join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in vals)
            # Feature{ int64_list=3 { value=1 packed } }
            inner = _len_delim(3, _len_delim(1, packed))
        entry = _len_delim(1, key.encode()) + _len_delim(2, inner)
        feats += _len_delim(1, entry)  # Features.feature map entry
    return _len_delim(1, feats)  # Example.features


def decode_example(buf: bytes) -> Dict[str, object]:
    """Decode the subset written by encode_example (and by TF itself)."""
    out: Dict[str, object] = {}
    # Example -> features (field 1)
    pos = 0
    features_buf = b""
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            payload = buf[pos : pos + ln]
            pos += ln
            if num == 1:
                features_buf += payload
        elif wire == 0:
            _, pos = _read_varint(buf, pos)
        else:
            raise ValueError(f"unsupported wire type {wire}")
    # Features -> map entries (field 1)
    pos = 0
    while pos < len(features_buf):
        tag, pos = _read_varint(features_buf, pos)
        ln, pos = _read_varint(features_buf, pos)
        entry = features_buf[pos : pos + ln]
        pos += ln
        key, val = _decode_map_entry(entry)
        out[key] = val
    return out


def _decode_map_entry(entry: bytes):
    pos = 0
    key = ""
    value = None
    while pos < len(entry):
        tag, pos = _read_varint(entry, pos)
        num = tag >> 3
        ln, pos = _read_varint(entry, pos)
        payload = entry[pos : pos + ln]
        pos += ln
        if num == 1:
            key = payload.decode()
        else:
            value = _decode_feature(payload)
    return key, value


def _decode_feature(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num = tag >> 3
        ln, pos = _read_varint(buf, pos)
        payload = buf[pos : pos + ln]
        pos += ln
        if num == 1:  # bytes_list
            # BytesList{ value=1 }: may hold several values; return first/only
            p2 = 0
            vals = []
            while p2 < len(payload):
                _, p2 = _read_varint(payload, p2)
                l2, p2 = _read_varint(payload, p2)
                vals.append(payload[p2 : p2 + l2])
                p2 += l2
            return vals[0] if len(vals) == 1 else vals
        if num == 3:  # int64_list
            p2 = 0
            vals = []
            while p2 < len(payload):
                tag2, p2 = _read_varint(payload, p2)
                if tag2 & 7 == 2:  # packed
                    l2, p2 = _read_varint(payload, p2)
                    end = p2 + l2
                    while p2 < end:
                        v, p2 = _read_varint(payload, p2)
                        vals.append(_signed64(v))
                else:
                    v, p2 = _read_varint(payload, p2)
                    vals.append(_signed64(v))
            return vals if len(vals) != 1 else vals[0]
    return None


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


# --------------------------------------------------------------------------- #
# TFRecord file IO
# --------------------------------------------------------------------------- #


def write_tfrecord(path: str, examples: Iterator[bytes], index_path: Optional[str] = None) -> int:
    """Write framed records; optionally a DALI-style .idx ("offset size")."""
    n = 0
    idx_lines = []
    with open(path, "wb") as f:
        for payload in examples:
            offset = f.tell()
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
            idx_lines.append(f"{offset} {f.tell() - offset}\n")
            n += 1
    if index_path:
        with open(index_path, "w") as f:
            f.writelines(idx_lines)
    return n


def read_tfrecord(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            hcrc = f.read(4)
            if verify_crc and struct.unpack("<I", hcrc)[0] != _masked_crc(header):
                raise ValueError(f"{path}: corrupt header crc")
            payload = f.read(length)
            pcrc = f.read(4)
            if verify_crc and struct.unpack("<I", pcrc)[0] != _masked_crc(payload):
                raise ValueError(f"{path}: corrupt payload crc")
            yield payload


def read_index(index_path: str) -> List[Tuple[int, int]]:
    out = []
    with open(index_path) as f:
        for line in f:
            if line.strip():
                off, size = line.split()
                out.append((int(off), int(size)))
    return out


def read_record_at(path: str, offset: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        header = f.read(8)
        (length,) = struct.unpack("<Q", header)
        f.read(4)
        return f.read(length)


# --------------------------------------------------------------------------- #
# ImageNet -> shards (reference create_records.py)
# --------------------------------------------------------------------------- #

# reference create_records.py:70-81 — files DALI/libjpeg can't decode as-is
BROKEN_IMAGES = {
    "n02105855_2933.JPEG",  # PNG saved as JPEG
    # CMYK jpegs
    "n01739381_1309.JPEG", "n02077923_14822.JPEG", "n02447366_23489.JPEG",
    "n02492035_15739.JPEG", "n02747177_10752.JPEG", "n03018349_4028.JPEG",
    "n03062245_4620.JPEG", "n03347037_9675.JPEG", "n03467068_12171.JPEG",
    "n03529860_11437.JPEG", "n03544143_17228.JPEG", "n03633091_5218.JPEG",
    "n03710637_5125.JPEG", "n03961711_5286.JPEG", "n04033995_2932.JPEG",
    "n04258138_17003.JPEG", "n04264628_27969.JPEG", "n04336792_7448.JPEG",
    "n04371774_5854.JPEG", "n04596742_4225.JPEG", "n07583066_647.JPEG",
    "n13037406_4650.JPEG", "ILSVRC2012_val_00019877.JPEG",
}

TRAIN_SHARDS = 128  # create_records.py:55
VAL_SHARDS = 16  # create_records.py:56
SHUFFLE_SEED = 42  # create_records.py:37


def _encode_one(path: str, label: int) -> bytes:
    fname = os.path.basename(path)
    if fname in BROKEN_IMAGES:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)  # re-encode (create_records.py:87-91)
        data = buf.getvalue()
    else:
        with open(path, "rb") as f:
            data = f.read()
    return encode_example(
        {"image/encoded": data, "image/class/label": label, "image/filename": fname.encode()}
    )


def _write_shard(args) -> int:
    shard_path, index_path, files, labels = args
    return write_tfrecord(shard_path, (_encode_one(p, l) for p, l in zip(files, labels)), index_path)


def create_records(
    data_dir: str,
    out_dir: Optional[str] = None,
    train_shards: int = TRAIN_SHARDS,
    val_shards: int = VAL_SHARDS,
    workers: int = 8,
) -> None:
    """ImageNet folder tree -> sharded TFRecords (create_records.py:138-159).
    `data_dir` holds train/<synset>/*.JPEG and val/<synset>/*.JPEG."""
    from sota_imagenet_tpu.data.pipeline import scan_image_folder

    out_dir = out_dir or data_dir
    for split, n_shards in (("val", val_shards), ("train", train_shards)):
        files, labels, _ = scan_image_folder(os.path.join(data_dir, split))
        order = np.arange(len(files))
        np.random.default_rng(SHUFFLE_SEED).shuffle(order)  # deterministic (create_records.py:37,110-112)
        files = [files[i] for i in order]
        labels = [labels[i] for i in order]
        rec_dir = os.path.join(out_dir, f"{split}_records")
        idx_dir = os.path.join(out_dir, f"{split}_indexes")
        for d in (rec_dir, idx_dir):
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d)
        bounds = np.linspace(0, len(files), n_shards + 1).astype(int)
        tasks = []
        for s in range(n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            name = f"{split}-{s:05d}-of-{n_shards:05d}"
            tasks.append(
                (os.path.join(rec_dir, name), os.path.join(idx_dir, name + ".idx"), files[lo:hi], labels[lo:hi])
            )
        if workers > 1:
            with Pool(workers) as pool:
                pool.map(_write_shard, tasks)
        else:
            for t in tasks:
                _write_shard(t)


# --------------------------------------------------------------------------- #
# Loader over shards (DALI tfrecord reader equivalent)
# --------------------------------------------------------------------------- #


class TFRecordLoader:
    """Per-host sharded reader with random access via .idx files.

    Matches the DALI reader semantics (dali_dataloader.py:48-62): global list
    of records split over hosts, shuffled each epoch for training; decode +
    crop happens in a thread pool like FolderLoader.
    """

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
        import jax

        split = "train" if is_train else "val"
        rec_dir = os.path.join(root, f"{split}_records")
        idx_dir = os.path.join(root, f"{split}_indexes")
        self.entries: List[Tuple[str, int]] = []  # (shard_path, offset)
        for name in sorted(os.listdir(rec_dir)):
            idx_path = os.path.join(idx_dir, name + ".idx")
            if not os.path.exists(idx_path):
                idx_path = os.path.join(idx_dir, name)
            for off, _ in read_index(idx_path):
                self.entries.append((os.path.join(rec_dir, name), off))
        pi, pc = jax.process_index(), jax.process_count()
        self.entries = self.entries[pi::pc]
        self.is_train = is_train
        self.batch_size = batch_size
        self.image_size = image_size
        self.min_area = min_area
        self.random_interpolation = random_interpolation
        self.interpolation = interpolation  # base train filter (legacy resize_method)
        self.full_crop = full_crop
        self.workers = max(workers, 1)
        self.seed = seed
        self.drop_last = drop_last
        self.device_resample = bool(device_resample) and is_train  # see FolderLoader
        self.meta_kind = "resample" if self.device_resample else None
        self.epoch = 0

    def __len__(self):
        n = len(self.entries) // self.batch_size
        if not self.drop_last and len(self.entries) % self.batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _load_one(self, entry: Tuple[str, int], rng: np.random.Generator) -> Tuple[np.ndarray, int]:
        from sota_imagenet_tpu.data import decode as D

        payload = read_record_at(entry[0], entry[1])
        ex = decode_example(payload)
        jpeg = ex["image/encoded"]
        label = int(ex["image/class/label"])
        if self.is_train:
            img = D.decode_train(
                jpeg,
                rng,
                self.image_size,
                min_area=self.min_area,
                random_interpolation=self.random_interpolation,
                interpolation=self.interpolation,
            )
        else:
            img = D.decode_val(jpeg, self.image_size, full_crop=self.full_crop)
        return img, label

    def _decode_batch_native(self, payloads, rngs):
        """One C call per batch via the native executor (train only)."""
        if not self.is_train:
            return None
        from sota_imagenet_tpu.data import decode as D
        from sota_imagenet_tpu.data import native

        if not hasattr(self, "_exec"):
            try:
                self._exec = native.BatchExecutor(workers=self.workers) if native.available() else None
            except Exception:
                self._exec = None
        if self._exec is None:
            return None
        jpegs, crops, filts = [], [], []
        for (jpeg, _), rng in zip(payloads, rngs):
            dims = native.jpeg_dims(jpeg)
            crops.append(
                D.sample_random_crop(rng, dims[0], dims[1], min_area=self.min_area) if dims else (0, 0, 1, 1)
            )
            jpegs.append(jpeg)
            filts.append(
                (1 - (native.FILT_CUBIC if self.interpolation == "cubic" else native.FILT_TRIANGULAR))
                if (self.random_interpolation and rng.random() < 0.5)
                else (native.FILT_CUBIC if self.interpolation == "cubic" else native.FILT_TRIANGULAR)
            )
        if self.device_resample:
            canvas = D.resample_canvas(self.image_size)
            ticket = self._exec.submit_scaled(jpegs, crops, self.image_size, canvas)
            imgs, failed, dims_out = self._exec.wait_scaled(ticket)
            meta = np.concatenate([dims_out, np.asarray(filts, np.int32)[:, None]], axis=1)
            for fi in failed:
                # per-slot rng (deterministic per epoch/sample) + the loader's
                # filter settings, so rare non-JPEG slots keep the same crop /
                # interpolation distributions as the healthy path.
                img, sh, sw, filt = D.decode_train_scaled(
                    jpegs[fi],
                    rngs[fi],
                    self.image_size,
                    min_area=self.min_area,
                    random_interpolation=self.random_interpolation,
                    interpolation=self.interpolation,
                    use_native=False,
                )
                imgs[fi] = img
                meta[fi] = (sh, sw, filt)
            return imgs, meta
        ticket = self._exec.submit(jpegs, crops, filts, (self.image_size, self.image_size))
        imgs, failed = self._exec.wait(ticket)
        for fi in failed:
            imgs[fi] = D.decode_train(
                jpegs[fi],
                rngs[fi],
                self.image_size,
                min_area=self.min_area,
                random_interpolation=self.random_interpolation,
                interpolation=self.interpolation,
                use_native=False,
            )
        return imgs

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        from sota_imagenet_tpu.data import decode as D

        order = np.arange(len(self.entries))
        if self.is_train:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        bs = self.batch_size
        with ThreadPoolExecutor(self.workers) as pool:
            for b in range(len(self)):
                idxs = order[b * bs : (b + 1) * bs]
                rngs = [np.random.default_rng((self.seed, self.epoch, int(i))) for i in idxs]
                payloads = [
                    (lambda ex: (ex["image/encoded"], int(ex["image/class/label"])))(
                        decode_example(read_record_at(*self.entries[i]))
                    )
                    for i in idxs
                ]
                labels = np.asarray([p[1] for p in payloads], np.int32)
                meta = None
                got = self._decode_batch_native(payloads, rngs)
                if got is None:
                    if self.device_resample:
                        parts = list(
                            pool.map(
                                lambda a: D.decode_train_scaled(
                                    a[0][0],
                                    a[1],
                                    self.image_size,
                                    min_area=self.min_area,
                                    random_interpolation=self.random_interpolation,
                                    interpolation=self.interpolation,
                                ),
                                zip(payloads, rngs),
                            )
                        )
                        imgs = np.stack([p[0] for p in parts])
                        meta = np.asarray([p[1:] for p in parts], np.int32)
                    else:
                        results = list(
                            pool.map(lambda a: self._decode_payload(a[0], a[1]), zip(payloads, rngs))
                        )
                        imgs = np.stack(results)
                elif self.device_resample:
                    imgs, meta = got
                else:
                    imgs = got
                if meta is not None:
                    yield imgs, labels, meta
                    continue
                if not self.drop_last:
                    # pad + mask the tail so masked eval scores every record
                    # exactly once (see FolderLoader.__iter__)
                    n_real = imgs.shape[0]
                    if n_real < bs:
                        imgs = np.concatenate([imgs, np.repeat(imgs[-1:], bs - n_real, axis=0)])
                        labels = np.concatenate([labels, np.full(bs - n_real, -1, np.int32)])
                    mask = np.zeros((bs,), np.float32)
                    mask[:n_real] = 1.0
                    yield imgs, labels, mask
                else:
                    yield imgs, labels
        self.epoch += 1

    def _decode_payload(self, payload, rng):
        from sota_imagenet_tpu.data import decode as D

        jpeg, _ = payload
        if self.is_train:
            return D.decode_train(
                jpeg,
                rng,
                self.image_size,
                min_area=self.min_area,
                random_interpolation=self.random_interpolation,
                interpolation=self.interpolation,
            )
        return D.decode_val(jpeg, self.image_size, full_crop=self.full_crop)
