"""ctypes binding for the native C++ data-loader (native/gh_loader.cpp).

Builds the shared library on first use (make, cached) and exposes:
- ``decode_image(path)`` -> (H, W, 3) float32
- ``PrefetchPool``: threaded decode+mask pipeline (submit/wait tickets)

Falls back to PIL when the toolchain or libjpeg/libpng are unavailable, so
the framework never hard-depends on the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_LIB_LOCK = threading.Lock()
_MAX_HW = 4096


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_NATIVE_DIR, "libgh_loader.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.gh_decode_image.restype = ctypes.c_int
        lib.gh_pool_create.restype = ctypes.c_void_p
        lib.gh_pool_create.argtypes = [ctypes.c_int]
        lib.gh_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.gh_pool_submit.restype = ctypes.c_int
        lib.gh_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_char_p, ctypes.c_char_p]
        lib.gh_pool_wait.restype = ctypes.c_int
        lib.gh_pool_wait.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
        return lib


def native_available() -> bool:
    return _build_and_load() is not None


def decode_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1]; native decode with PIL fallback."""
    lib = _build_and_load()
    if lib is not None:
        buf = np.empty((_MAX_HW, _MAX_HW, 3), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = lib.gh_decode_image(
            path.encode(), buf.ctypes.data_as(ctypes.c_void_p), _MAX_HW,
            _MAX_HW, ctypes.byref(h), ctypes.byref(w))
        if rc == 0:
            return buf.reshape(-1)[: h.value * w.value * 3].reshape(
                h.value, w.value, 3).copy()
    import PIL.Image

    return np.asarray(PIL.Image.open(path).convert("RGB"),
                      np.float32) / 255.0


class PrefetchPool:
    """Threaded decode + fused mask/background pipeline."""

    def __init__(self, n_threads: int = 4):
        self._lib = _build_and_load()
        self._ticket = 0
        if self._lib is not None:
            self._pool = self._lib.gh_pool_create(n_threads)
        else:
            self._pool = None

    def submit(self, img_path: str, mask_path: Optional[str] = None) -> int:
        self._ticket += 1
        t = self._ticket
        if self._pool is not None:
            self._lib.gh_pool_submit(
                self._pool, t, img_path.encode(),
                mask_path.encode() if mask_path else None)
        else:
            # synchronous fallback
            self._fallback = getattr(self, "_fallback", {})
            img = decode_image(img_path)
            if mask_path:
                import PIL.Image

                m = np.asarray(PIL.Image.open(mask_path))
                if m.ndim == 3:
                    m = m.mean(-1)
                mask = (m >= 100).astype(np.float32)
                img = img * mask[..., None]
            else:
                mask = np.ones(img.shape[:2], np.float32)
            self._fallback[t] = (img, mask)
        return t

    def wait(self, ticket: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._pool is None:
            return self._fallback.pop(ticket)
        rgb = np.empty((_MAX_HW, _MAX_HW, 3), np.float32)
        mask = np.empty((_MAX_HW, _MAX_HW), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.gh_pool_wait(
            self._pool, ticket, rgb.ctypes.data_as(ctypes.c_void_p),
            mask.ctypes.data_as(ctypes.c_void_p), _MAX_HW, _MAX_HW,
            ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"native sample load failed (rc={rc})")
        hw = h.value * w.value
        return (rgb.reshape(-1)[: hw * 3].reshape(h.value, w.value, 3).copy(),
                mask.reshape(-1)[:hw].reshape(h.value, w.value).copy())

    def close(self):
        if self._pool is not None:
            self._lib.gh_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
