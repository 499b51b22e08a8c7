"""ctypes binding for the native host-side resampler (native/resample.cpp).

Auto-builds the shared library on first use when a toolchain is available;
callers fall back to PIL/jax.image when it is not (ops/image.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("rsvldm")

_LIB_PATH = Path(__file__).parent / "libresample.so"
_SRC_DIR = Path(__file__).parent.parent.parent / "native"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_SRC_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:  # pragma: no cover
        log.debug("native build failed: %s", e)
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.resize_bicubic_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.normalize_u8.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def resize_bicubic_u8(src: np.ndarray, dh: int, dw: int,
                      normalize: str = "pm1") -> np.ndarray:
    """uint8 [H,W,C] -> float32 [dh,dw,C]; normalize: 'pm1' | 'unit' | 'none'."""
    lib = get_lib()
    assert lib is not None, "native resampler unavailable"
    src = np.ascontiguousarray(src)
    assert src.dtype == np.uint8 and src.ndim == 3
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    mode = {"none": 0, "pm1": 1, "unit": 2}[normalize]
    lib.resize_bicubic_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw, mode)
    return dst


def normalize_u8(src: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src)
    dst = np.empty(src.shape, np.float32)
    lib.normalize_u8(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     src.size, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst
