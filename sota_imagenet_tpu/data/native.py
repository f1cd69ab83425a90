"""ctypes binding for the native decode core (native/imgpipe.cpp).

The C calls release the GIL, so a plain ThreadPoolExecutor gets real
multi-core decode — the role DALI's C++ pipeline threads played
(SURVEY.md §2.3). Falls back cleanly when the .so isn't built.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOAD_LOCK = threading.Lock()  # load() races from decode pool threads otherwise

FILT_TRIANGULAR = 0
FILT_CUBIC = 1


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libimgpipe.so"),
        os.path.join(os.path.dirname(__file__), "libimgpipe.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def _try_build() -> None:
    """Best-effort one-shot build of the .so (make -C native)."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ndir = os.path.join(here, "native")
    if os.path.exists(os.path.join(ndir, "Makefile")):
        try:
            subprocess.run(["make", "-C", ndir], capture_output=True, timeout=120, check=False)
        except Exception:
            pass


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        if _TRIED:  # lost the race: the winner already finished loading
            return _LIB
        lib = _load_locked()
        _LIB = lib  # publish BEFORE _TRIED: lock-free readers see the pair in order
        _TRIED = True
        return _LIB


def _load_locked() -> Optional[ctypes.CDLL]:
    path = _find_lib()
    if path is None:
        _try_build()
        path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ip_jpeg_dims.argtypes = [u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ip_jpeg_dims.restype = ctypes.c_int
    lib.ip_decode_crop_resize.argtypes = [u8p, ctypes.c_size_t] + [ctypes.c_int] * 7 + [u8p]
    lib.ip_decode_crop_resize.restype = ctypes.c_int
    lib.ip_decode_val.argtypes = [u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, u8p]
    lib.ip_decode_val.restype = ctypes.c_int
    if hasattr(lib, "ip_decode_crop_scaled"):
        lib.ip_decode_crop_scaled.argtypes = (
            [u8p, ctypes.c_size_t]
            + [ctypes.c_int] * 8
            + [u8p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        )
        lib.ip_decode_crop_scaled.restype = ctypes.c_int
    return lib


def available() -> bool:
    return load() is not None


def _as_u8p(data: bytes):
    return ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))


def jpeg_dims(data: bytes):
    lib = load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.ip_jpeg_dims(_as_u8p(data), len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_crop_resize(
    data: bytes,
    crop: tuple,  # (x, y, w, h) in full-res coords; (0,0,0,0) = full image
    out_size: tuple,  # (w, h)
    filt: int = FILT_TRIANGULAR,
) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    out_w, out_h = out_size
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.ip_decode_crop_resize(
        _as_u8p(data), len(data), crop[0], crop[1], crop[2], crop[3], out_w, out_h, filt,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def decode_crop_scaled(
    data: bytes,
    crop: tuple,  # (x, y, w, h) full-res coords; (0,0,0,0) = full image
    target: int,  # the final (device-side) resample size
    canvas: int,  # fixed output canvas (>= target), top-left anchored
) -> Optional[tuple]:
    """Host half of the device-resample split: DCT-scaled decode of the crop,
    no host resampling. Returns (img (canvas, canvas, 3) uint8, sh, sw)."""
    lib = load()
    if lib is None or not hasattr(lib, "ip_decode_crop_scaled"):
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    sw, sh = ctypes.c_int(), ctypes.c_int()
    rc = lib.ip_decode_crop_scaled(
        _as_u8p(data), len(data), crop[0], crop[1], crop[2], crop[3], target, target,
        canvas, canvas, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(sw), ctypes.byref(sh),
    )
    return (out, sh.value, sw.value) if rc == 0 else None


def decode_val(data: bytes, resize_shorter: int, crop: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    out = np.empty((crop, crop, 3), np.uint8)
    rc = lib.ip_decode_val(
        _as_u8p(data), len(data), resize_shorter, crop, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out if rc == 0 else None


class BatchExecutor:
    """Persistent C++ worker pool decoding whole batches with one call per
    batch (native/pipeline.cpp) — the DALI-executor role. Supports
    double-buffering via (submit, wait) tickets."""

    def __init__(self, workers: int = 8):
        lib = load()
        if lib is None:
            raise RuntimeError("libimgpipe.so not available")
        u8p = ctypes.POINTER(ctypes.c_uint8)
        if not hasattr(lib, "pp_create"):
            raise RuntimeError("libimgpipe.so too old: rebuild (make -C native)")
        lib.pp_create.argtypes = [ctypes.c_int]
        lib.pp_create.restype = ctypes.c_void_p
        lib.pp_destroy.argtypes = [ctypes.c_void_p]
        lib.pp_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.pp_submit.restype = ctypes.c_int
        lib.pp_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int)]
        lib.pp_wait.restype = ctypes.c_int
        if hasattr(lib, "pp_submit_scaled"):
            lib.pp_submit_scaled.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ]
            lib.pp_submit_scaled.restype = ctypes.c_int
        self._lib = lib
        self._handle = lib.pp_create(int(workers))
        self._ticket = 0
        self._inflight = {}  # ticket -> (out_array, keepalive refs, n)

    def submit(self, datas, crops, filts, out_size) -> int:
        """datas: list[bytes]; crops: (n,4) int array-like; filts: (n,);
        out_size: (w, h). Returns a ticket. Non-blocking."""
        n = len(datas)
        out_w, out_h = out_size
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        ptrs = (ctypes.c_char_p * n)(*datas)
        lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
        crops_arr = np.ascontiguousarray(np.asarray(crops, np.int32)).reshape(-1)
        filts_arr = np.ascontiguousarray(np.asarray(filts, np.int32))
        self._ticket += 1
        t = self._ticket
        rc = self._lib.pp_submit(
            self._handle, t, n,
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_char_p)),
            lens,
            crops_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            filts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_w, out_h,
        )
        if rc != 0:
            raise RuntimeError(f"pp_submit failed: {rc}")
        # keep buffers alive until wait()
        self._inflight[t] = (out, (datas, ptrs, lens, crops_arr, filts_arr), n)
        return t

    def submit_scaled(self, datas, crops, target: int, canvas: int) -> int:
        """Scaled-decode submit (device-resample split): each slot is a
        (canvas, canvas, 3) uint8 buffer holding the DCT-scaled crop top-left;
        wait_scaled() also returns the (n, 2) valid (h, w) extents."""
        if not hasattr(self._lib, "pp_submit_scaled"):
            raise RuntimeError("libimgpipe.so too old: rebuild (make -C native)")
        n = len(datas)
        out = np.empty((n, canvas, canvas, 3), np.uint8)
        dims = np.empty((n, 2), np.int32)
        ptrs = (ctypes.c_char_p * n)(*datas)
        lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
        crops_arr = np.ascontiguousarray(np.asarray(crops, np.int32)).reshape(-1)
        self._ticket += 1
        t = self._ticket
        rc = self._lib.pp_submit_scaled(
            self._handle, t, n,
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_char_p)),
            lens,
            crops_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            target, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            canvas, canvas,
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if rc != 0:
            raise RuntimeError(f"pp_submit_scaled failed: {rc}")
        self._inflight[t] = (out, (datas, ptrs, lens, crops_arr, dims), n)
        return t

    def wait(self, ticket: int):
        """Blocks; returns (images (n,h,w,3) uint8, failed_indices list)."""
        out, _keep, n = self._inflight.pop(ticket)
        fails = (ctypes.c_int * n)()
        nf = self._lib.pp_wait(self._handle, ticket, fails)
        if nf < 0:
            raise RuntimeError("pp_wait: unknown ticket")
        return out, [fails[i] for i in range(nf)]

    def wait_scaled(self, ticket: int):
        """Blocks; returns (images (n,canvas,canvas,3) uint8, failed list,
        dims (n,2) int32 = per-slot valid (h, w))."""
        out, keep, n = self._inflight.pop(ticket)
        fails = (ctypes.c_int * n)()
        nf = self._lib.pp_wait(self._handle, ticket, fails)
        if nf < 0:
            raise RuntimeError("pp_wait: unknown ticket")
        return out, [fails[i] for i in range(nf)], keep[-1]

    def close(self):
        if self._handle:
            self._lib.pp_destroy(self._handle)
            self._handle = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass
