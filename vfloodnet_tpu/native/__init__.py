"""Native host-IO bindings (ctypes over libvflood_io.so).

Builds on first import when the shared library is missing (g++ + libpng are
part of the image); every entry point degrades gracefully to the PIL path if
the build fails, so the framework never hard-depends on the native lib.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvflood_io.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-s", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception as e:  # pragma: no cover - build env dependent
            warnings.warn(f"native IO build failed ({e}); using PIL fallback")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        warnings.warn(f"native IO load failed ({e}); using PIL fallback")
        return None
    lib.vf_write_palette_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int]
    lib.vf_write_palette_png.restype = ctypes.c_int
    lib.vf_read_palette_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.vf_read_palette_png.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def write_palette_png(path: str, labels: np.ndarray,
                      palette: Sequence[int], compress_level: int = 1) -> bool:
    """Fast indexed-PNG writer. Returns False if the native lib is
    unavailable (caller should fall back to PIL)."""
    lib = _load()
    if lib is None:
        return False
    labels = np.ascontiguousarray(labels, np.uint8)
    pal = np.ascontiguousarray(np.asarray(palette, np.uint8).reshape(-1))
    n_entries = min(len(pal) // 3, 256)
    rc = lib.vf_write_palette_png(
        path.encode(), labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.shape[0], labels.shape[1],
        pal.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_entries,
        compress_level)
    return rc == 0


def read_palette_png(path: str) -> Optional[np.ndarray]:
    """Fast indexed-PNG label reader; None on fallback."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vf_read_palette_png(path.encode(), None, ctypes.byref(h),
                                 ctypes.byref(w))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.vf_read_palette_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w))
    return out if rc == 0 else None
