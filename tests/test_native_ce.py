"""Native cluster editing must match the Python oracle exactly."""

import numpy as np
import pytest

from ahsoka_tpu.cluster._native_ce import (cluster_editing_native,
                                           native_ce_available)
from ahsoka_tpu.cluster.editing import cluster_editing


def _random_weights(n, seed, planted=None):
    rng = np.random.default_rng(seed)
    W = rng.normal(0, 1, (n, n))
    W = (W + W.T) / 2
    if planted is not None:
        for group in planted:
            for i in group:
                for j in group:
                    if i != j:
                        W[i, j] += 4.0
        W -= 1.5
    np.fill_diagonal(W, 0)
    return W


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_python_random(seed):
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    W = _random_weights(24, seed)
    assert cluster_editing_native(W) == cluster_editing(W)


@pytest.mark.parametrize("seed", range(3))
def test_native_matches_python_planted(seed):
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    groups = [list(range(0, 10)), list(range(10, 20)),
              list(range(20, 30))]
    W = _random_weights(30, seed, planted=groups)
    got_nat = cluster_editing_native(W)
    got_py = cluster_editing(W)
    assert got_nat == got_py
    big = [c for c in got_py if len(c) >= 8]
    assert len(big) == 3


def test_native_trivial_cases():
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    assert cluster_editing_native(np.zeros((0, 0))) == []
    assert cluster_editing_native(np.zeros((1, 1))) == [[0]]
    w = -np.ones((3, 3))
    np.fill_diagonal(w, 0)
    assert cluster_editing_native(w) == [[0], [1], [2]]


def _to_sparse(W):
    n = W.shape[0]
    iu = np.triu_indices(n, k=1)
    mask = W[iu] != 0
    return n, iu[0][mask], iu[1][mask], W[iu][mask]


@pytest.mark.parametrize("seed", range(5))
def test_sparse_matches_dense(seed):
    from ahsoka_tpu.cluster._native_ce import cluster_editing_sparse
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    W = _random_weights(24, seed)
    # sparsify: zero out 60% of entries symmetrically
    rng = np.random.default_rng(seed + 100)
    drop = rng.random(W.shape) < 0.6
    drop = np.triu(drop, 1)
    W[drop | drop.T] = 0.0
    dense = cluster_editing(W, prefer_native=False)
    sparse = cluster_editing_sparse(*_to_sparse(W), exact_priorities=True)
    assert sparse == dense


@pytest.mark.parametrize("seed", range(3))
def test_sparse_matches_dense_planted(seed):
    from ahsoka_tpu.cluster._native_ce import cluster_editing_sparse
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    groups = [list(range(0, 12)), list(range(12, 24))]
    W = _random_weights(24, seed, planted=groups)
    rng = np.random.default_rng(seed + 7)
    drop = np.triu(rng.random(W.shape) < 0.3, 1)
    W[drop | drop.T] = 0.0
    dense = cluster_editing(W, prefer_native=False)
    sparse = cluster_editing_sparse(*_to_sparse(W), exact_priorities=True)
    assert sparse == dense


def test_sparse_large_banded_graph():
    """Position-local similarity graph at a scale the dense path cannot
    touch: 20k reads, ~60 neighbours each."""
    from ahsoka_tpu.cluster._native_ce import cluster_editing_sparse
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    import time
    rng = np.random.default_rng(0)
    n, band = 20000, 60
    us, vs, ws = [], [], []
    for u in range(n):
        for dv in range(1, band // 2):
            v = u + dv
            if v >= n:
                continue
            same = (u % 2) == (v % 2)     # two interleaved haplotypes
            w = rng.normal(3.0 if same else -3.0, 0.5)
            us.append(u)
            vs.append(v)
            ws.append(w)
    t0 = time.time()
    clusters = cluster_editing_sparse(
        n, np.asarray(us), np.asarray(vs), np.asarray(ws))
    dt = time.time() - t0
    big = [c for c in clusters if len(c) > n // 4]
    assert len(big) == 2
    assert all((r % 2) == (big[0][0] % 2) for r in big[0])
    assert dt < 120, f"sparse CE too slow: {dt:.1f}s"
