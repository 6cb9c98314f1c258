"""ctypes bindings for the native host-pipeline kernels (native/host_ops.cc).

Auto-builds the shared library on first use (``make -C native``); falls back
to equivalent numpy implementations when no compiler is available.  All
functions release the GIL, so the threaded DataLoader overlaps sample
preparation across its worker threads.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmdrdm_host.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resize_bilinear_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.resize_bilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.center_crop_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------ numpy ref ---

def _taps(dst_size: int, src_size: int):
    c = (np.arange(dst_size) + 0.5) * (src_size / dst_size) - 0.5
    c = np.clip(c, 0, src_size - 1)
    lo = c.astype(np.int64)
    hi = np.minimum(lo + 1, src_size - 1)
    return lo, hi, (c - lo).astype(np.float32)


def _resize_numpy(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    sh, sw = src.shape[:2]
    ylo, yhi, wy = _taps(dh, sh)
    xlo, xhi, wx = _taps(dw, sw)
    a = src[ylo][:, xlo]
    b = src[ylo][:, xhi]
    c = src[yhi][:, xlo]
    d = src[yhi][:, xhi]
    if src.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx).astype(np.float32)


# -------------------------------------------------------------- public ----

def resize_u8_to_f32(src: np.ndarray, dh: int, dw: int,
                     scale: float = 1.0 / 255.0) -> np.ndarray:
    """(H, W, C) uint8 -> (dh, dw, C) float32 * scale, bilinear
    (half-pixel convention, edge clamp)."""
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    lib = _load()
    out = np.empty((dh, dw, ch), np.float32)
    if lib is None:
        return _resize_numpy(src.astype(np.float32), dh, dw) * scale
    lib.resize_bilinear_u8_to_f32(
        src.ctypes.data, sh, sw, ch, out.ctypes.data, dh, dw,
        ctypes.c_float(scale))
    return out


def resize_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(H, W, C) uint8 -> (dh, dw, C) uint8, bilinear (rounded).

    Wire-format variant for the device-augment path: rgb stays uint8 until
    the compiled train step normalizes it on device (1/4 the host->device
    transfer bytes of float32)."""
    f = resize_u8_to_f32(src, dh, dw, scale=1.0)
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def resize_f32(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(H, W) float32 -> (dh, dw) float32, bilinear."""
    src = np.ascontiguousarray(src, np.float32)
    sh, sw = src.shape
    lib = _load()
    if lib is None:
        return _resize_numpy(src, dh, dw)
    out = np.empty((dh, dw), np.float32)
    lib.resize_bilinear_f32(src.ctypes.data, sh, sw, out.ctypes.data, dh, dw)
    return out
