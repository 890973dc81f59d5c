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
