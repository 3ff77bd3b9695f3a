"""ctypes bindings for the native host-side data-prep library.

``native/srnative.cpp`` implements the Pillow-exact bicubic resampler and
PSNR in C++ (the framework's native data-loader layer; the reference had
none — SURVEY §2.4). This module loads it when present (building it on
first use if a toolchain exists) and degrades to the numpy
implementations otherwise; callers use :func:`resize_bicubic_u8` /
:func:`psnr_y_u8` and never see the difference except speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsrnative.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.sr_resize_bicubic_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2
    lib.sr_resize_bicubic_u8.restype = ctypes.c_int
    lib.sr_psnr_y_u8.argtypes = [u8p, u8p] + [ctypes.c_int] * 3
    lib.sr_psnr_y_u8.restype = ctypes.c_double
    lib.sr_mse_u8.argtypes = [u8p, u8p, ctypes.c_int64]
    lib.sr_mse_u8.restype = ctypes.c_double
    lib.sr_native_abi_version.restype = ctypes.c_int
    if lib.sr_native_abi_version() != 1:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bicubic_u8(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Pillow-exact bicubic resize, native when available.

    ``img``: uint8 (H, W) or (H, W, C) C-contiguous.
    """
    lib = load()
    if lib is None:
        from sr.kernels.bicubic import pil_resize_exact_u8

        return pil_resize_exact_u8(img, out_hw)
    squeeze = img.ndim == 2
    x = np.ascontiguousarray(img[:, :, None] if squeeze else img)
    h, w, c = x.shape
    oh, ow = out_hw
    out = np.empty((oh, ow, c), dtype=np.uint8)
    rc = lib.sr_resize_bicubic_u8(_u8ptr(x), h, w, c, _u8ptr(out), oh, ow)
    if rc != 0:
        raise ValueError(f"sr_resize_bicubic_u8 failed (rc={rc})")
    return out[:, :, 0] if squeeze else out


def psnr_y_u8(a: np.ndarray, b: np.ndarray, border: int = 0) -> float:
    """Y-plane PSNR with border shave, native when available."""
    assert a.shape == b.shape and a.ndim == 2
    lib = load()
    if lib is None:
        from sr.eval.metrics import psnr

        return psnr(a.astype(np.float64), b.astype(np.float64), border=border)
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    h, w = a.shape
    return float(lib.sr_psnr_y_u8(_u8ptr(a), _u8ptr(b), h, w, border))
