"""Host-side JPEG decode + geometric augmentation.

Replaces DALI's GPU decode stage (reference dali_dataloader.py:65-79,145-148).
TPUs have no nvJPEG, so decode stays on host CPUs; the tricks that keep it
cheap:

  * JPEG *draft mode*: libjpeg can decode directly at 1/2, 1/4, 1/8 scale from
    the DCT coefficients. We decode at the smallest scale that still covers
    the requested crop — the same idea as DALI's fused decode+random_crop.
  * the random crop happens before the full-resolution resize, so the expensive
    filter runs on crop-sized data only.

Distributions match DALI's `decoders.image_random_crop`
(dali_dataloader.py:65-72): aspect ~ U[0.75, 1.25] (uniform, NOT log-uniform
like torchvision), area ~ U[min_area, 1.0], 100 attempts then center fallback.
Interpolation: triangular == PIL BILINEAR (antialiased triangle filter),
cubic == PIL BICUBIC; random_interpolation picks per-image 50/50
(dali_dataloader.py:74-79).
"""

from __future__ import annotations

import io
import math
from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD  # noqa: F401 (re-export)

TRIANGULAR = Image.BILINEAR
CUBIC = Image.BICUBIC


def _open(src: Union[str, bytes]) -> Image.Image:
    if isinstance(src, (bytes, bytearray, memoryview)):
        return Image.open(io.BytesIO(src))
    return Image.open(src)


def sample_random_crop(
    rng: np.random.Generator,
    width: int,
    height: int,
    min_area: float = 0.08,
    max_area: float = 1.0,
    aspect_range: Tuple[float, float] = (0.75, 1.25),
    num_attempts: int = 100,
) -> Tuple[int, int, int, int]:
    """(x, y, w, h) with DALI's distribution (dali_dataloader.py:65-72)."""
    area = width * height
    for _ in range(num_attempts):
        target_area = rng.uniform(min_area, max_area) * area
        aspect = rng.uniform(*aspect_range)
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            x = int(rng.integers(0, width - w + 1))
            y = int(rng.integers(0, height - h + 1))
            return x, y, w, h
    # fallback: biggest valid center crop at aspect 1
    s = min(width, height)
    return (width - s) // 2, (height - s) // 2, s, s


def _read_bytes(src: Union[str, bytes]) -> bytes:
    if isinstance(src, (bytes, bytearray, memoryview)):
        return bytes(src)
    with open(src, "rb") as f:
        return f.read()


def decode_train(
    src: Union[str, bytes],
    rng: np.random.Generator,
    image_size: int,
    min_area: float = 0.08,
    random_interpolation: bool = False,
    interpolation: str = "triangular",
    use_native: bool = True,
) -> np.ndarray:
    """Decode + random-resized-crop to (image_size, image_size, 3) uint8.

    ``interpolation`` sets the base resize filter (legacy flat-schema
    ``resize_method: cubic``, e.g. _old_configs exp80/exp81);
    ``random_interpolation`` flips to the OTHER filter with p=0.5 per image.

    Fast path: the native libjpeg core (data/native.py) fuses scaled decode,
    crop and antialiased resize in C with the GIL released; PIL fallback
    otherwise (identical distributions).
    """
    if use_native:
        from sota_imagenet_tpu.data import native

        if native.available():
            data = _read_bytes(src)
            dims = native.jpeg_dims(data)
            if dims is not None:
                w0, h0 = dims
                x, y, w, h = sample_random_crop(rng, w0, h0, min_area=min_area)
                base = native.FILT_CUBIC if interpolation == "cubic" else native.FILT_TRIANGULAR
                filt = (1 - base) if (random_interpolation and rng.random() < 0.5) else base
                out = native.decode_crop_resize(data, (x, y, w, h), (image_size, image_size), filt)
                if out is not None:
                    return out
    img = _open(src)
    w0, h0 = img.size
    x, y, w, h = sample_random_crop(rng, w0, h0, min_area=min_area)
    # draft-mode decode: smallest DCT scale whose crop still >= image_size
    if img.format == "JPEG":
        img.draft("RGB", (max(w0 * image_size // max(w, 1), 1), max(h0 * image_size // max(h, 1), 1)))
        sw, sh = img.size
        if (sw, sh) != (w0, h0):
            sx, sy = sw / w0, sh / h0
            x, y = int(x * sx), int(y * sy)
            w, h = max(int(w * sx), 1), max(int(h * sy), 1)
    if img.mode != "RGB":
        img = img.convert("RGB")
    crop = img.crop((x, y, x + w, y + h))
    base = CUBIC if interpolation == "cubic" else TRIANGULAR
    other = TRIANGULAR if interpolation == "cubic" else CUBIC
    interp = other if (random_interpolation and rng.random() < 0.5) else base
    out = crop.resize((image_size, image_size), interp)
    return np.asarray(out, dtype=np.uint8)


def resample_canvas(image_size: int) -> int:
    """Fixed device-resample canvas: 2.5x the target, rounded up to a lane-
    friendly multiple of 8. Why 2.5: the DCT-scale rule (smallest n/8 with
    scaled crop >= target in BOTH dims) bounds the scaled min dim < 2*target,
    and the DALI aspect distribution (U[0.75, 1.25], decode.sample_random_crop)
    bounds max/min <= 1.25 — so the worst-case scaled max dim is just under
    2.5*target. A 2x canvas looked tempting (36% less transfer) but ~10% of
    crops would overflow and take the one-notch-smaller DCT scale, i.e. a
    device UPSCALE of up to 1.25x — measured up to ±30/255 against the host
    path. At 2.5x no legal crop overflows (imgpipe.cpp's shrink loop is then
    only a guard for out-of-distribution callers)."""
    return (5 * image_size // 2 + 7) // 8 * 8


def decode_train_scaled(
    src: Union[str, bytes],
    rng: np.random.Generator,
    image_size: int,
    min_area: float = 0.08,
    random_interpolation: bool = False,
    interpolation: str = "triangular",
    use_native: bool = True,
) -> Tuple[np.ndarray, int, int, int]:
    """Host half of the device-resample split: sample the DALI crop, decode it
    at the best DCT scale WITHOUT host resampling. Returns (canvas uint8
    (C, C, 3) top-left-anchored, sh, sw, filt) for ops.resample on device.

    The crop/filter distributions are IDENTICAL to decode_train (same rng call
    sequence), so switching loader.device_resample changes only where the
    resample runs, not what is sampled."""
    canvas = resample_canvas(image_size)
    if use_native:
        from sota_imagenet_tpu.data import native

        if native.available():
            data = _read_bytes(src)
            dims = native.jpeg_dims(data)
            if dims is not None:
                w0, h0 = dims
                x, y, w, h = sample_random_crop(rng, w0, h0, min_area=min_area)
                base = 1 if interpolation == "cubic" else 0
                filt = (1 - base) if (random_interpolation and rng.random() < 0.5) else base
                out = native.decode_crop_scaled(data, (x, y, w, h), image_size, canvas)
                if out is not None:
                    img, sh, sw = out
                    return img, sh, sw, filt
    # PIL fallback (non-JPEG / no .so): decode the crop at full res; if it
    # fits the canvas the device resamples it (same stats as the C path at
    # DCT scale 8/8); else resize to the target here (device = identity).
    img = _open(src)
    w0, h0 = img.size
    x, y, w, h = sample_random_crop(rng, w0, h0, min_area=min_area)
    base = 1 if interpolation == "cubic" else 0
    filt = (1 - base) if (random_interpolation and rng.random() < 0.5) else base
    if img.mode != "RGB":
        img = img.convert("RGB")
    crop = img.crop((x, y, x + w, y + h))
    cw, ch = crop.size
    canvas_img = np.zeros((canvas, canvas, 3), np.uint8)
    if cw <= canvas and ch <= canvas:
        canvas_img[:ch, :cw] = np.asarray(crop, dtype=np.uint8)
        return canvas_img, ch, cw, filt
    resized = crop.resize((image_size, image_size), CUBIC if filt else TRIANGULAR)
    canvas_img[:image_size, :image_size] = np.asarray(resized, dtype=np.uint8)
    return canvas_img, image_size, image_size, filt


def val_resize_size(image_size: int, full_crop: bool = False) -> int:
    """Shorter-side resize target (reference formula, dali_dataloader.py:147)."""
    if full_crop:
        return image_size
    return int(math.ceil((image_size * 1.14 + 8) // 16 * 16))


def decode_val(src: Union[str, bytes], image_size: int, full_crop: bool = False, use_native: bool = True) -> np.ndarray:
    """Decode → resize shorter side → center crop (dali_dataloader.py:145-158)."""
    if use_native:
        from sota_imagenet_tpu.data import native

        if native.available():
            data = _read_bytes(src)
            out = native.decode_val(data, val_resize_size(image_size, full_crop), image_size)
            if out is not None:
                return out
    img = _open(src)
    w0, h0 = img.size
    resize_shorter = val_resize_size(image_size, full_crop)
    if img.format == "JPEG":
        scale = resize_shorter / min(w0, h0)
        img.draft("RGB", (max(int(w0 * scale), 1), max(int(h0 * scale), 1)))
        w0, h0 = img.size
    if img.mode != "RGB":
        img = img.convert("RGB")
    scale = resize_shorter / min(w0, h0)
    nw, nh = max(int(round(w0 * scale)), resize_shorter), max(int(round(h0 * scale)), resize_shorter)
    img = img.resize((nw, nh), TRIANGULAR)
    x = (nw - image_size) // 2
    y = (nh - image_size) // 2
    img = img.crop((x, y, x + image_size, y + image_size))
    return np.asarray(img, dtype=np.uint8)


# --------------------------------------------------------------------------- #
# Rectangular validation (closes the reference's TODO, dali_dataloader.py:5)
# --------------------------------------------------------------------------- #


def rect_buckets(image_size: int):
    """Three static aspect buckets (h, w): tall / square / wide. The long side
    is 4:3-ish rounded down to a multiple of 8 (TPU sublane alignment); the
    aspect threshold is chosen so the shorter-side resize always leaves enough
    pixels to crop the long side (resize target ≈ 1.14*size ≥ long/thresh)."""
    long = max(int(image_size * 4 / 3) // 8 * 8, (image_size + 8) // 8 * 8)
    thresh = max(1.2, long / val_resize_size(image_size) + 0.02)
    return {
        "tall": (long, image_size),
        "square": (image_size, image_size),
        "wide": (image_size, long),
    }, thresh


def bucket_of(width: int, height: int, thresh: float) -> str:
    if width >= height * thresh:
        return "wide"
    if height >= width * thresh:
        return "tall"
    return "square"


def decode_val_rect(src: Union[str, bytes], image_size: int, crop_hw) -> np.ndarray:
    """Aspect-preserving validation decode: resize shorter side to the
    reference target (dali_dataloader.py:147), center-crop to the bucket's
    rectangular (h, w) — evaluates at near-native aspect instead of the
    square crop's distortion/loss."""
    ch, cw = crop_hw
    img = _open(src)
    w0, h0 = img.size
    resize_shorter = val_resize_size(image_size)
    if img.format == "JPEG":
        scale = resize_shorter / min(w0, h0)
        img.draft("RGB", (max(int(w0 * scale), 1), max(int(h0 * scale), 1)))
        w0, h0 = img.size
    if img.mode != "RGB":
        img = img.convert("RGB")
    scale = resize_shorter / min(w0, h0)
    nw = max(int(round(w0 * scale)), cw)
    nh = max(int(round(h0 * scale)), ch)
    img = img.resize((nw, nh), TRIANGULAR)
    x = (nw - cw) // 2
    y = (nh - ch) // 2
    img = img.crop((x, y, x + cw, y + ch))
    return np.asarray(img, dtype=np.uint8)
