"""ctypes bindings for the native host-data kernels (hemdata.cpp).

Auto-builds libhemdata.so on first import when a compiler is present;
falls back to the numpy implementations (which remain the parity
reference) when unavailable.  `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhemdata.so")
_LIB: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.join(_HERE, "hemdata.cpp")
    for cc in ("c++", "g++", "cc"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", src, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_HERE, "hemdata.cpp")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.homography_flow_f32.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_double, fp]
    lib.homography_mapping_f32.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_double, fp]
    lib.normalize_gray_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, dp, dp, fp]
    lib.normalize_gray_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int, dp, dp, fp]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def homography_to_flow_native(H: np.ndarray, h: int, w: int, eps: float = 1e-6):
    """Native twin of geometry.host.homography_to_flow_np; None if no lib."""
    lib = _load()
    if lib is None:
        return None
    Hc = np.ascontiguousarray(np.asarray(H, np.float64).reshape(9))
    out = np.empty((h, w, 2), np.float32)
    lib.homography_flow_f32(_dptr(Hc), h, w, float(eps), _fptr(out))
    return out


def homography_to_mapping_native(H: np.ndarray, h: int, w: int, eps: float = 1e-6):
    lib = _load()
    if lib is None:
        return None
    Hc = np.ascontiguousarray(np.asarray(H, np.float64).reshape(9))
    out = np.empty((h, w, 2), np.float32)
    lib.homography_mapping_f32(_dptr(Hc), h, w, float(eps), _fptr(out))
    return out


def normalize_gray_native(img: np.ndarray, mean: np.ndarray, std: np.ndarray):
    """Native twin of data.hem_data.normalize_gray; None if no lib/bad dtype."""
    lib = _load()
    if lib is None:
        return None
    h, w, c = img.shape
    if c != 3:
        return None
    m = np.ascontiguousarray(np.asarray(mean, np.float64).reshape(3))
    s = np.ascontiguousarray(np.asarray(std, np.float64).reshape(3))
    out = np.empty((h, w, 1), np.float32)
    if img.dtype == np.uint8:
        im = np.ascontiguousarray(img)
        lib.normalize_gray_u8(
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, _dptr(m), _dptr(s), _fptr(out)
        )
    elif img.dtype == np.float32:
        im = np.ascontiguousarray(img)
        lib.normalize_gray_f32(_fptr(im), h, w, _dptr(m), _dptr(s), _fptr(out))
    else:
        return None
    return out
