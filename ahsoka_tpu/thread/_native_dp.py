"""ctypes loader for the native sequential DP baseline
(native/dp_baseline.cpp) — the single-core reference point for bench.py and
a second oracle for DP tests."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "dp_baseline.cpp")
_LIB = os.path.join(_HERE, "_libahsoka_dp.so")

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
        lib.ahsoka_dp_baseline.restype = ctypes.c_int64
        lib.ahsoka_dp_baseline.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def native_dp_available() -> bool:
    return _load() is not None


def run_native_dp(candidates: np.ndarray, num_candidates: np.ndarray,
                  coverage: np.ndarray, consensus: np.ndarray,
                  genotypes: np.ndarray, ploidy: int,
                  switch_cost: float, affine_cost: float,
                  cov_w: float = 1.0, geno_w: float = 1.0
                  ) -> Optional[Tuple[int, np.ndarray]]:
    """Returns (dp_cells, per-position state indices) or None."""
    lib = _load()
    if lib is None:
        return None
    P, M = candidates.shape
    A = genotypes.shape[1]
    c = np.ascontiguousarray(candidates, dtype=np.int32)
    nc = np.ascontiguousarray(num_candidates, dtype=np.int32)
    cov = np.ascontiguousarray(coverage, dtype=np.float32)
    cons = np.ascontiguousarray(consensus, dtype=np.int32)
    gen = np.ascontiguousarray(genotypes, dtype=np.float32)
    out = np.zeros(P, dtype=np.int32)
    ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    cells = lib.ahsoka_dp_baseline(
        ptr(c, ctypes.c_int32), ptr(nc, ctypes.c_int32),
        ptr(cov, ctypes.c_float), ptr(cons, ctypes.c_int32),
        ptr(gen, ctypes.c_float), P, M, A, ploidy,
        switch_cost, affine_cost, cov_w, geno_w,
        ptr(out, ctypes.c_int32))
    return int(cells), out
