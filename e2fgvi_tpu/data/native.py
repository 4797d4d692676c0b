"""ctypes bindings for the native host-pipeline kernels (native/host_ops.cpp).

Build once with `python -m e2fgvi_tpu.data.native` (or scripts/build_native):
compiles native/host_ops.cpp to native/libhost_ops.so with g++ -O3. All
callers fall back to the numpy implementations when the library is absent.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_DIR, "host_ops.cpp")
_LIB = os.path.join(_DIR, "libhost_ops.so")

_lib = None


def build(force=False):
    if os.path.isfile(_LIB) and not force:
        return _LIB
    subprocess.check_call(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _LIB])
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB):
        return None
    lib = ctypes.CDLL(_LIB)
    lib.dilate_cross.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.composite_blend.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dilate_cross(mask: np.ndarray, iterations: int = 4) -> np.ndarray:
    """Native iterated 3x3-cross dilation (falls back to numpy)."""
    lib = _load()
    if lib is None:
        from e2fgvi_tpu.data import masks as _m
        return _m.dilate_cross(mask, iterations)
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(m)
    lib.dilate_cross(_ptr(m, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
                     m.shape[0], m.shape[1], iterations)
    return out


def composite_blend(pred: np.ndarray, orig: np.ndarray, mask: np.ndarray,
                    prev: np.ndarray | None) -> np.ndarray:
    """Fused composite (+ optional 50/50 blend); falls back to numpy.

    pred: float32 (H,W,3) in [0,255]; orig uint8 (H,W,3); mask uint8 (H,W);
    prev float32 (H,W,3) or None."""
    lib = _load()
    if lib is None:
        img = (pred.astype(np.uint8) * mask[..., None] +
               orig * (1 - mask[..., None])).astype(np.float32)
        return img if prev is None else prev * 0.5 + img * 0.5
    pred = np.ascontiguousarray(pred, np.float32)
    orig = np.ascontiguousarray(orig, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(pred)
    prev_ptr = (_ptr(np.ascontiguousarray(prev, np.float32), ctypes.c_float)
                if prev is not None else
                ctypes.cast(None, ctypes.POINTER(ctypes.c_float)))
    lib.composite_blend(_ptr(pred, ctypes.c_float),
                        _ptr(orig, ctypes.c_uint8),
                        _ptr(mask, ctypes.c_uint8), prev_ptr,
                        _ptr(out, ctypes.c_float),
                        pred.shape[0], pred.shape[1])
    return out


if __name__ == "__main__":
    print("built:", build(force=True))
