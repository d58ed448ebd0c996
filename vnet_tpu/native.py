"""ctypes bindings for the native host runtime (csrc/libvnet_host.so).

The native library provides the CPU-hot host-path ops — threaded trilinear
resampling, windowing, patch extraction and blend accumulation — used to
keep the TPU fed without SimpleITK (the reference's host path,
`/root/reference/pipeline/NiftiDataset3D.py:366-398`, is single-threaded
Python). Falls back gracefully: ``available()`` is False when the library
hasn't been built (``cmake -B csrc/build csrc && ninja -C csrc/build``),
and callers keep using the scipy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CANDIDATES = (
    os.path.join(_ROOT, "csrc", "build", "libvnet_host.so"),
    os.path.join(_ROOT, "libvnet_host.so"),
)

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for path in _CANDIDATES:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.vnet_host_ops_version.restype = ctypes.c_int
            lib.vnet_window_normalize.argtypes = [
                _f32p, _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float]
            lib.vnet_resample3d.argtypes = [
                _f32p, _i64p, _f32p, _i64p, _f64p, _f64p, ctypes.c_int,
                ctypes.c_float, ctypes.c_int]
            lib.vnet_patch_grid.restype = ctypes.c_int64
            lib.vnet_patch_grid.argtypes = [
                _i64p, _i64p, _i64p, _i64p, ctypes.c_int64]
            lib.vnet_extract_patches.argtypes = [
                _f32p, _i64p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64,
                _f32p, ctypes.c_int]
            lib.vnet_blend_accumulate.argtypes = [
                _f32p, _f32p, _i64p, ctypes.c_int64, _f32p, _f32p, _i64p,
                _i64p, ctypes.c_int64]
            _LIB = lib
            break
    return _LIB


def build(asan: bool = False, tsan: bool = False) -> bool:
    """Build csrc/ with cmake+ninja; returns success."""
    src = os.path.join(_ROOT, "csrc")
    bld = os.path.join(src, "build")
    flags = []
    if asan:
        flags.append("-DVNET_ASAN=ON")
    if tsan:
        flags.append("-DVNET_TSAN=ON")
    try:
        subprocess.run(["cmake", "-B", bld, "-G", "Ninja", *flags, src],
                       check=True, capture_output=True)
        subprocess.run(["ninja", "-C", bld, "vnet_host"], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _TRIED
    _TRIED = False
    return _load() is not None


def available() -> bool:
    return _load() is not None


def window_normalize(data: np.ndarray, lo: float, hi: float,
                     out_min: float = 0.0, out_max: float = 255.0) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(data, np.float32)
    out = np.empty_like(src)
    lib.vnet_window_normalize(src.reshape(-1), out.reshape(-1), src.size,
                              lo, hi, out_min, out_max)
    return out


def resample3d(data: np.ndarray, out_shape, M: np.ndarray, offset: np.ndarray,
               nearest: bool = False, default_value: float = 0.0,
               num_threads: int = 4) -> np.ndarray:
    """Resample with continuous-index map c = M @ o + offset (the same
    contract as scipy.ndimage.affine_transform order<=1)."""
    lib = _load()
    src = np.ascontiguousarray(data, np.float32)
    out = np.empty(tuple(int(s) for s in out_shape), np.float32)
    lib.vnet_resample3d(
        src, np.asarray(src.shape, np.int64), out,
        np.asarray(out.shape, np.int64),
        np.ascontiguousarray(M, np.float64).reshape(-1),
        np.ascontiguousarray(offset, np.float64).reshape(-1),
        0 if nearest else 1, default_value, num_threads)
    return out


def patch_grid(vol_shape, patch, stride) -> np.ndarray:
    lib = _load()
    vs = np.asarray(vol_shape, np.int64)
    p = np.asarray(patch, np.int64)
    s = np.asarray(stride, np.int64)
    n = lib.vnet_patch_grid(vs, p, s, np.zeros(3, np.int64), 0)
    starts = np.zeros((int(n), 3), np.int64)
    lib.vnet_patch_grid(vs, p, s, starts.reshape(-1), n)
    return starts


def extract_patches(volume: np.ndarray, patch, starts: np.ndarray,
                    num_threads: int = 4) -> np.ndarray:
    """volume (X,Y,Z,C) f32, starts (N,3) -> (N, *patch, C)."""
    lib = _load()
    vol = np.ascontiguousarray(volume, np.float32)
    c = vol.shape[-1]
    n = starts.shape[0]
    p = tuple(int(x) for x in patch)
    out = np.empty((n, *p, c), np.float32)
    lib.vnet_extract_patches(
        vol.reshape(-1), np.asarray(vol.shape[:3], np.int64), c,
        np.asarray(p, np.int64),
        np.ascontiguousarray(starts, np.int64).reshape(-1), n,
        out.reshape(-1), num_threads)
    return out


def blend_accumulate(acc: np.ndarray, weight: np.ndarray, probs: np.ndarray,
                     window: np.ndarray, starts: np.ndarray) -> None:
    """In-place: acc (X,Y,Z,C) += probs (N,*patch,C) * window; weight += w."""
    lib = _load()
    assert acc.flags.c_contiguous and weight.flags.c_contiguous
    patch = probs.shape[1:4]
    lib.vnet_blend_accumulate(
        acc.reshape(-1), weight.reshape(-1),
        np.asarray(acc.shape[:3], np.int64), acc.shape[-1],
        np.ascontiguousarray(probs, np.float32).reshape(-1),
        np.ascontiguousarray(window, np.float32).reshape(-1),
        np.asarray(patch, np.int64),
        np.ascontiguousarray(starts, np.int64).reshape(-1),
        probs.shape[0])
