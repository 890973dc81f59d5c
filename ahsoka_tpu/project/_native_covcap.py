"""ctypes loader for the native coverage-cap greedy (native/covcap.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "covcap.cpp")
_LIB = os.path.join(_HERE, "_libahsoka_covcap.so")

_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-march=native", "-shared",
                            "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.ahsoka_covcap.restype = ctypes.c_int64
        lib.ahsoka_covcap.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def native_covcap(r_nz: np.ndarray, p_nz: np.ndarray, R: int, P: int,
                  cap: int) -> Optional[np.ndarray]:
    """keep mask (bool [R]) from row-major COO of covered entries, or
    None when the toolchain is unavailable."""
    lib = _load()
    if lib is None:
        return None
    r = np.ascontiguousarray(r_nz, dtype=np.int64)
    p = np.ascontiguousarray(p_nz, dtype=np.int64)
    cov = np.zeros(P, dtype=np.int32)
    keep = np.zeros(R, dtype=np.uint8)
    lib.ahsoka_covcap(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(r), R, P, cap,
        cov.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)
