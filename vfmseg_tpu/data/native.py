"""ctypes bindings for the native data loader (native/dataloader.cc).

Loads native/libvfmdata.so if present (build with `make -C native`); every
entry point has a PIL/numpy fallback so the framework runs without the
native library. The native path fuses decode + resize + normalize into one
C pass per sample — the host-side hot loop of training.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libvfmdata.so")


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vfm_image_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.vfm_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    lib.vfm_load_label.argtypes = list(lib.vfm_load_image.argtypes)
    lib.vfm_normalize_pad.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    return lib


def available() -> bool:
    return _lib() is not None


def image_size(path: str) -> Optional[Tuple[int, int]]:
    lib = _lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    if lib.vfm_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return int(w.value), int(h.value)


def load_image(path: str, size_wh: Optional[Tuple[int, int]] = None
               ) -> Optional[np.ndarray]:
    """RGB uint8 HWC, optionally bilinear-resized to (w, h). None = fallback."""
    lib = _lib()
    if lib is None:
        return None
    if size_wh is None:
        sz = image_size(path)
        if sz is None:
            return None
        size_wh = sz
    w, h = size_wh
    out = np.empty((h, w, 3), np.uint8)
    if lib.vfm_load_image(path.encode(), w, h, out):
        return None
    return out


def load_label(path: str, size_wh: Optional[Tuple[int, int]] = None
               ) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    if size_wh is None:
        sz = image_size(path)
        if sz is None:
            return None
        size_wh = sz
    w, h = size_wh
    out = np.empty((h, w), np.uint8)
    if lib.vfm_load_label(path.encode(), w, h, out):
        return None
    return out


def normalize_pad(img: np.ndarray, size_hw: Tuple[int, int],
                  mean: np.ndarray, std: np.ndarray,
                  pad_val: float = 0.0) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3:
        return None
    h, w = img.shape[:2]
    th, tw = size_hw
    out = np.empty((th, tw, 3), np.float32)
    rc = lib.vfm_normalize_pad(
        np.ascontiguousarray(img), h, w, th, tw,
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
        float(pad_val), out)
    return None if rc else out
