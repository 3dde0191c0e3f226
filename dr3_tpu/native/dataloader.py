"""ctypes bindings for the native prefetching image loader (dataloader.cpp).

Builds ``libdr3io.so`` on demand with the in-tree Makefile (g++ + libpng +
libjpeg); falls back gracefully when the toolchain or libraries are absent
— callers check ``available()`` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdr3io.so")
_lib: Optional[ctypes.CDLL] = None
_build_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.dl_open.restype = ctypes.c_void_p
        lib.dl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
        lib.dl_next.restype = ctypes.c_long
        lib.dl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
        lib.dl_close.argtypes = [ctypes.c_void_p]
        lib.dl_decode.restype = ctypes.c_int
        lib.dl_decode.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str, max_pixels: int = 64 << 20) -> Optional[np.ndarray]:
    """Synchronously decode one image to float32 grayscale [H, W] in [0,1]."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.dl_decode(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), max_pixels,
        ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def iter_images(paths: List[str], n_threads: int = 4,
                capacity: int = 8) -> Iterator[np.ndarray]:
    """Ordered prefetching iterator over image paths."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    handle = lib.dl_open(arr, len(paths), n_threads, capacity)
    try:
        while True:
            data = ctypes.POINTER(ctypes.c_float)()
            h = ctypes.c_int()
            w = ctypes.c_int()
            idx = lib.dl_next(handle, ctypes.byref(data), ctypes.byref(h),
                              ctypes.byref(w))
            if idx < 0:
                return
            if not data:
                raise IOError(f"failed to decode {paths[idx]}")
            n = h.value * w.value
            out = np.ctypeslib.as_array(data, shape=(n,)).reshape(
                h.value, w.value).copy()
            yield out
    finally:
        lib.dl_close(handle)
