"""ctypes loader for native cluster editing (native/cluster_editing.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "cluster_editing.cpp")
_LIB = os.path.join(_HERE, "_libahsoka_ce.so")

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
        lib.ahsoka_cluster_editing.restype = ctypes.c_int64
        lib.ahsoka_cluster_editing.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def native_ce_available() -> bool:
    return _load() is not None


def cluster_editing_native(weights: np.ndarray
                           ) -> Optional[List[List[int]]]:
    lib = _load()
    if lib is None:
        return None
    n = weights.shape[0]
    if n == 0:
        return []
    W = np.ascontiguousarray(weights, dtype=np.float64).copy()
    assign = np.zeros(n, dtype=np.int32)
    k = lib.ahsoka_cluster_editing(
        W.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    clusters: List[List[int]] = [[] for _ in range(k)]
    for i, c in enumerate(assign):
        clusters[int(c)].append(i)
    return clusters
