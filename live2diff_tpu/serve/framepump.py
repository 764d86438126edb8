"""ctypes bindings for the native serving runtime (framepump.cpp).

Builds the shared library on first import (g++ -O3, cached next to the
source); every entry point degrades gracefully to None/PIL fallbacks if the
toolchain or libjpeg is unavailable, so the pure-python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "framepump.cpp")
_LIB_PATH = os.path.join(_HERE, "_framepump.so")

_lib = None
_build_lock = threading.Lock()


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", _LIB_PATH, "-ljpeg", "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fp_encode_jpeg.restype = ctypes.c_long
        lib.fp_encode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.fp_decode_jpeg.restype = ctypes.c_long
        lib.fp_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fp_free.argtypes = [ctypes.c_void_p]
        lib.fp_ring_create.restype = ctypes.c_void_p
        lib.fp_ring_create.argtypes = [ctypes.c_int]
        lib.fp_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        lib.fp_ring_pop.restype = ctypes.c_long
        lib.fp_ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int
        ]
        lib.fp_ring_size.restype = ctypes.c_long
        lib.fp_ring_size.argtypes = [ctypes.c_void_p]
        lib.fp_ring_dropped.restype = ctypes.c_long
        lib.fp_ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    return _build() is not None


def encode_jpeg(rgb: np.ndarray, quality: int = 80) -> Optional[bytes]:
    """uint8 [H, W, 3] -> JPEG bytes, or None if the native lib is unavailable."""
    lib = _build()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    out = ctypes.c_void_p()
    size = lib.fp_encode_jpeg(
        rgb.ctypes.data_as(ctypes.c_char_p), h, w, quality, ctypes.byref(out)
    )
    if size <= 0:
        return None
    data = ctypes.string_at(out, size)
    lib.fp_free(out)
    return data


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 [H, W, 3], or None if unavailable."""
    lib = _build()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    h, w = ctypes.c_int(), ctypes.c_int()
    size = lib.fp_decode_jpeg(data, len(data), ctypes.byref(out),
                              ctypes.byref(h), ctypes.byref(w))
    if size <= 0:
        return None
    arr = np.frombuffer(ctypes.string_at(out, size), dtype=np.uint8).copy()
    lib.fp_free(out)
    return arr.reshape(h.value, w.value, 3)


class FrameRing:
    """Native drop-oldest frame queue shared across threads."""

    def __init__(self, capacity: int = 4):
        lib = _build()
        if lib is None:
            raise RuntimeError("framepump native library unavailable")
        self._lib = lib
        self._ring = lib.fp_ring_create(capacity)

    def push(self, data: bytes) -> None:
        self._lib.fp_ring_push(self._ring, data, len(data))

    def pop(self, timeout_ms: int = 100, max_size: int = 16 << 20) -> Optional[bytes]:
        buf = ctypes.create_string_buffer(max_size)
        size = self._lib.fp_ring_pop(self._ring, buf, max_size, timeout_ms)
        if size <= 0:
            return None
        return buf.raw[:size]

    def __len__(self) -> int:
        return self._lib.fp_ring_size(self._ring)

    @property
    def dropped(self) -> int:
        return self._lib.fp_ring_dropped(self._ring)

    def __del__(self):
        try:
            self._lib.fp_ring_destroy(self._ring)
        except Exception:
            pass
