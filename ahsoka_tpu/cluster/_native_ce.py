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
_SRC_SPARSE = os.path.join(_REPO, "native", "cluster_editing_sparse.cpp")
_LIB = os.path.join(_HERE, "_libahsoka_ce.so")

_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        newest_src = max(os.path.getmtime(_SRC),
                         os.path.getmtime(_SRC_SPARSE))
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < newest_src):
            subprocess.run(["g++", "-O3", "-march=native", "-shared",
                            "-fPIC", "-std=c++17", "-o", _LIB, _SRC,
                            _SRC_SPARSE],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.ahsoka_cluster_editing.restype = ctypes.c_int64
        lib.ahsoka_cluster_editing.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.ahsoka_cluster_editing_wh.restype = ctypes.c_int64
        lib.ahsoka_cluster_editing_wh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.ahsoka_cluster_editing_sparse.restype = ctypes.c_int64
        lib.ahsoka_cluster_editing_sparse.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.ahsoka_cluster_editing_sparse_wh.restype = ctypes.c_int64
        lib.ahsoka_cluster_editing_sparse_wh.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def native_ce_available() -> bool:
    return _load() is not None


def cluster_editing_sparse(num_nodes: int, edges_u: np.ndarray,
                           edges_v: np.ndarray, weights: np.ndarray,
                           exact_priorities: bool = False,
                           mode: str = "whatshap"
                           ) -> Optional[List[List[int]]]:
    """Sparse-graph variant (native/cluster_editing_sparse.cpp).

    ``mode="whatshap"`` runs the published decision rule with two lazy
    heaps; ``mode="fresh"`` this repo's single-heap greedy.  For both,
    ``exact_priorities=True`` reproduces the dense oracle's selection
    order exactly (quadratic merge refresh; used by parity tests); the
    default approximate mode refreshes only merged-node edges, which is
    the update policy of the reference's WhatsHap EdgeHeap
    (divergence quantified in scripts/quantify_fastpaths.py)."""
    lib = _load()
    if lib is None:
        return None
    if num_nodes == 0:
        return []
    eu = np.ascontiguousarray(edges_u, dtype=np.int32)
    ev = np.ascontiguousarray(edges_v, dtype=np.int32)
    ew = np.ascontiguousarray(weights, dtype=np.float64)
    assign = np.zeros(num_nodes, dtype=np.int32)
    if mode == "whatshap":
        k = lib.ahsoka_cluster_editing_sparse_wh(
            num_nodes, len(ew),
            eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ew.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            1 if exact_priorities else 0,
            assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    else:
        k = lib.ahsoka_cluster_editing_sparse(
            num_nodes, len(ew),
            eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ew.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            1 if exact_priorities else 0,
            assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    clusters: List[List[int]] = [[] for _ in range(k)]
    for i, c in enumerate(assign):
        clusters[int(c)].append(i)
    return clusters


def cluster_editing_native(weights: np.ndarray, mode: str = "whatshap"
                           ) -> Optional[List[List[int]]]:
    lib = _load()
    if lib is None:
        return None
    n = weights.shape[0]
    if n == 0:
        return []
    W = np.ascontiguousarray(weights, dtype=np.float64).copy()
    assign = np.zeros(n, dtype=np.int32)
    fn = (lib.ahsoka_cluster_editing_wh if mode == "whatshap"
          else lib.ahsoka_cluster_editing)
    k = fn(W.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
           assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    clusters: List[List[int]] = [[] for _ in range(k)]
    for i, c in enumerate(assign):
        clusters[int(c)].append(i)
    return clusters
