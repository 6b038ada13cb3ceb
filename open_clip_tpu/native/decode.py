"""ctypes binding + on-demand build for the native JPEG decode stage.

Build model: ``decode.cpp`` is compiled once per source change into
``_oct_decode-<hash>.so`` alongside this file (or ``$OCT_NATIVE_CACHE`` when the
package dir is read-only). No pybind11 — plain C ABI + ctypes, per the image's
constraints. Set ``OCT_NATIVE_DECODE=0`` to disable without uninstalling.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "decode.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    if os.environ.get("OCT_NATIVE_DECODE", "1") in ("0", "false", "off"):
        return None
    try:
        with open(_SRC, "rb") as fh:
            tag = hashlib.sha256(fh.read()).hexdigest()[:12]
    except OSError:
        return None
    cache_dir = os.environ.get("OCT_NATIVE_CACHE") or os.path.dirname(_SRC)
    so_path = os.path.join(cache_dir, f"_oct_decode-{tag}.so")
    if not os.path.exists(so_path):
        if not os.access(cache_dir, os.W_OK):
            cache_dir = os.path.join(tempfile.gettempdir(), "oct_native")
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"_oct_decode-{tag}.so")
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", tmp, "-ljpeg", "-pthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError) as e:
            stderr = getattr(e, "stderr", b"") or b""
            logger.info("native decode build failed (%s); using PIL tier: %s",
                        e, stderr.decode(errors="replace")[:400])
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        logger.info("native decode load failed (%s); using PIL tier", e)
        return None
    lib.oct_decode_resize.restype = ctypes.c_int
    lib.oct_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]
    lib.oct_decode_batch.restype = None
    lib.oct_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    lib.oct_jpeg_dims.restype = ctypes.c_int
    lib.oct_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        with _LOCK:
            if not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def _available() -> bool:
    return _lib() is not None


# evaluated lazily on first attribute read in most callers; a module-level probe
# keeps the common `if NATIVE_DECODE_AVAILABLE` pattern cheap and honest
NATIVE_DECODE_AVAILABLE = os.environ.get("OCT_NATIVE_DECODE", "1") not in ("0", "false", "off")


def decode_resize_one(data: bytes, canvas: int, *, fractional: bool = True) -> Optional[np.ndarray]:
    """JPEG bytes -> (canvas, canvas, 3) uint8 via shortest-edge resize + center
    crop (the _Uint8CanvasTransform geometry). None when the native path can't
    handle the input (non-JPEG, CMYK, corrupt) — caller falls back to PIL.

    ``fractional=True`` decodes at the nearest M/8 DCT scale (libjpeg-turbo),
    which cuts IDCT + resample work; ``False`` restricts to PIL-draft 1/2^k
    scales for bit-level parity with the PIL tier."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.oct_decode_resize(data, len(data), canvas,
                               out.ctypes.data_as(ctypes.c_void_p),
                               1 if fractional else 0)
    return out if rc == 0 else None


def decode_resize_batch(
    datas: Sequence[bytes], canvas: int, nthreads: int = 0, *, fractional: bool = True,
) -> Tuple[Optional[np.ndarray], List[int]]:
    """Batch decode -> ((N, canvas, canvas, 3) uint8, per-image status list).

    status[i] == 0 means slot i is valid; nonzero slots are zero-filled and the
    caller should fall back to PIL for those. nthreads==0 picks cpu_count."""
    lib = _lib()
    if lib is None:
        return None, [1] * len(datas)
    n = len(datas)
    out = np.zeros((n, canvas, canvas, 3), np.uint8)
    bufs = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    status = (ctypes.c_int * n)()
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    lib.oct_decode_batch(bufs, lens, n, canvas,
                         out.ctypes.data_as(ctypes.c_void_p), status, nthreads,
                         1 if fractional else 0)
    return out, list(status)


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None if not parseable."""
    lib = _lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.oct_jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if rc == 0 else None
