"""ctypes bindings for the native preprocessing library.

`available()` is False until tools/build_native.sh has produced
libbdltpu.so; callers fall back to the PIL path.  The library is also built
automatically on first import if a compiler is present (best-effort).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libbdltpu.so")
_lib = None


def _try_build():
    src = os.path.join(_HERE, "preprocess.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       u8p, ctypes.c_int, ctypes.c_int]
    lib.crop_flip_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
    lib.eval_preprocess.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, u8p, f32p]
    lib.eval_preprocess.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img_u8: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.resize_bilinear_u8(_u8p(img_u8), img_u8.shape[0], img_u8.shape[1],
                           _u8p(out), dh, dw)
    return out


def eval_preprocess(img_u8: np.ndarray, mean: np.ndarray, std: np.ndarray,
                    size: int = 224, resize_to: int = 256):
    """Fused resize-short-side + center-crop + normalize.  Returns float32
    [size, size, 3] or None if the image is too small (caller falls back)."""
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    sh, sw = img_u8.shape[0], img_u8.shape[1]
    if sw < sh:
        rh = int(round(sh * resize_to / sw)); rw = resize_to
    else:
        rw = int(round(sw * resize_to / sh)); rh = resize_to
    scratch = np.empty((rh * rw * 3,), np.uint8)
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.eval_preprocess(_u8p(img_u8), sh, sw, resize_to, size,
                             _f32p(mean), _f32p(std), _u8p(scratch),
                             _f32p(out))
    return out if rc == 0 else None
