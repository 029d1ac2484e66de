"""ctypes bindings for the native host-ops library (native/hostops.cpp).

Auto-builds ``native/libhostops.so`` with g++ on first use; every entry
point has a numpy fallback so the framework functions without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhostops.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hostops_resize_normalize.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ]
            lib.hostops_to_uint8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize_u8(
    frames: np.ndarray, height: int, width: int,
    scale: float, shift: float, threads: int = 0,
) -> Optional[np.ndarray]:
    """uint8 (N,H,W,C) -> float32 (N,height,width,C) with align-corners
    bilinear resize and ``out = in*scale + shift``; None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    out = np.empty((n, height, width, c), dtype=np.float32)
    lib.hostops_resize_normalize(
        frames.ctypes.data, out.ctypes.data,
        n, h, w, c, height, width,
        ctypes.c_float(scale), ctypes.c_float(shift), threads,
    )
    return out


def to_uint8(frames01: np.ndarray, threads: int = 0) -> np.ndarray:
    """float32 in [0,1] -> uint8 with round+clamp (numpy fallback inline)."""
    lib = _load()
    frames01 = np.ascontiguousarray(frames01, dtype=np.float32)
    if lib is None:
        return np.clip(np.rint(frames01 * 255.0), 0, 255).astype(np.uint8)
    out = np.empty(frames01.shape, dtype=np.uint8)
    lib.hostops_to_uint8(
        frames01.ctypes.data, out.ctypes.data, frames01.size, threads
    )
    return out
