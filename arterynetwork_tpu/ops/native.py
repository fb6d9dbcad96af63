"""ctypes binding for the native (C++) kernels.

The shared library is built on demand from ``native/thinning.cpp`` with
g++ (no pybind11 in this environment; plain C ABI + ctypes).  The native
thinning is the sequential gold reference for the parallel TPU kernel and
the fast host path for very large volumes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "thinning.cpp")
_SO = os.path.join(_NATIVE_DIR, "libthinning.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.thin_volume.restype = ctypes.c_long
    lib.thin_volume.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.simple_point_code.restype = ctypes.c_int
    lib.simple_point_code.argtypes = [ctypes.c_uint32]
    _lib = lib
    return lib


def bounding_box(mask, margin: int = 1):
    """Slices of the foreground bounding box (with margin, clipped)."""
    mask = np.asarray(mask) != 0
    if not mask.any():
        return tuple(slice(0, 1) for _ in mask.shape)
    out = []
    for axis in range(mask.ndim):
        proj = mask.any(axis=tuple(a for a in range(mask.ndim)
                                   if a != axis))
        nz = np.nonzero(proj)[0]
        out.append(slice(max(int(nz[0]) - margin, 0),
                         min(int(nz[-1]) + margin + 1, mask.shape[axis])))
    return tuple(out)


def skeletonize_native(mask, distance_ordered: bool = True,
                       preserve_endpoints: bool = True,
                       distance_transform=None) -> np.ndarray:
    """Sequential distance-ordered thinning (C++).

    The volume is cropped to the foreground bounding box first: vessels
    occupy a small fraction of an MRA volume and the sequential passes
    scan the whole array.  ``distance_transform`` (unsquared EDT of the
    full mask) may be shared from the pipeline to avoid recomputation."""
    full = np.asarray(mask) != 0
    box = bounding_box(full, margin=2)
    vol = np.ascontiguousarray(full[box], dtype=np.uint8)
    nz, ny, nx = vol.shape
    lib = get_lib()
    if distance_transform is not None:
        d2 = np.ascontiguousarray(
            np.asarray(distance_transform)[box] ** 2, dtype=np.float32)
        d2_ptr = d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    elif distance_ordered:
        from .edt import edt_squared
        d2 = np.ascontiguousarray(
            np.asarray(edt_squared(vol, band=32)), dtype=np.float32)
        d2_ptr = d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        d2_ptr = ctypes.POINTER(ctypes.c_float)()
    lib.thin_volume(vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    nz, ny, nx, d2_ptr, int(preserve_endpoints))
    out = np.zeros(full.shape, bool)
    out[box] = vol.astype(bool)
    return out


def simple_point_native(code: int) -> bool:
    """Simple-point oracle for a 26-bit neighborhood code."""
    return bool(get_lib().simple_point_code(ctypes.c_uint32(code)))
