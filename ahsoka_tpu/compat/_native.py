"""ctypes loader for the native compat helper (native/stdcompat.cpp).

Builds the shared library on first use if a C++ toolchain is available;
callers must fall back to the pure-Python simulator when this module fails
to build or load (see stdmap.native_iteration_order).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "stdcompat.cpp")
_LIB = os.path.join(_HERE, "_libahsoka_compat.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.ahsoka_stdmap_order.restype = ctypes.c_int64
        lib.ahsoka_stdmap_order.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def stdmap_order(keys: Sequence[int]) -> Optional[List[int]]:
    lib = _ensure_built()
    if lib is None:
        return None
    n = len(keys)
    arr = (ctypes.c_int64 * n)(*keys)
    out = (ctypes.c_int64 * n)()
    k = lib.ahsoka_stdmap_order(arr, n, out)
    return list(out[:k])
