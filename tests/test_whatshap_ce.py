"""WhatsHap-published cluster-editing decision rule (mode="whatshap"):
oracle semantics, dense/sparse native parity (clusters AND decision
traces), and planted-cluster recovery."""

import numpy as np
import pytest

from ahsoka_tpu.cluster._native_ce import (cluster_editing_native,
                                           cluster_editing_sparse,
                                           native_ce_available)
from ahsoka_tpu.cluster.editing import _host_cluster_editing, cluster_editing
from test_native_ce import _random_weights, _to_sparse


def wh(W):
    return _host_cluster_editing(W, "whatshap")


def test_trivial_cases():
    assert wh(np.zeros((0, 0))) == []
    assert wh(np.zeros((1, 1))) == [[0]]
    w = -np.ones((3, 3))
    np.fill_diagonal(w, 0)
    assert wh(w) == [[0], [1], [2]]      # all repulsive: no merging
    w = np.ones((3, 3))
    np.fill_diagonal(w, 0)
    assert wh(w) == [[0, 1, 2]]          # all attractive: one cluster


def test_triangle_closure():
    # a-b and b-c strongly attractive, a-c unobserved (0): the rule must
    # still produce one cluster (merging a-b makes (ab)-c attractive)
    W = np.array([[0.0, 5.0, 0.0],
                  [5.0, 0.0, 5.0],
                  [0.0, 5.0, 0.0]])
    assert wh(W) == [[0, 1, 2]]


def test_conflict_forbids_first():
    # d strongly repels a but attracts b weakly: the a-d conflict is the
    # costliest decision and must not drag d into the a-b cluster
    W = np.array([[0.0, 6.0, -9.0],
                  [6.0, 0.0, 1.0],
                  [-9.0, 1.0, 0.0]])
    assert wh(W) == [[0, 1], [2]]


@pytest.mark.parametrize("seed", range(4))
def test_planted_recovery(seed):
    groups = [list(range(0, 10)), list(range(10, 20)),
              list(range(20, 30))]
    W = _random_weights(30, seed, planted=groups)
    got = wh(W)
    big = [c for c in got if len(c) >= 8]
    assert len(big) == 3


@pytest.mark.parametrize("seed", range(4))
def test_planted_recovery_sparse_approx(seed):
    """The approximate EdgeHeap-style refresh (the product default for
    the sparse whatshap solver) recovers planted clusters exactly like
    the oracle on separated instances."""
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    groups = [list(range(0, 10)), list(range(10, 20)),
              list(range(20, 30))]
    W = _random_weights(30, seed, planted=groups)
    approx = cluster_editing_sparse(*_to_sparse(W), mode="whatshap")
    assert sorted(map(sorted, approx)) == sorted(map(sorted, wh(W)))


@pytest.mark.parametrize("seed", range(5))
def test_dense_native_matches_oracle(seed):
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    W = _random_weights(24, seed)
    assert cluster_editing_native(W, mode="whatshap") == wh(W)


@pytest.mark.parametrize("seed", range(5))
def test_sparse_native_matches_oracle(seed):
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    W = _random_weights(24, seed)
    rng = np.random.default_rng(seed + 100)
    drop = np.triu(rng.random(W.shape) < 0.5, 1)
    W[drop | drop.T] = 0.0
    sparse = cluster_editing_sparse(*_to_sparse(W), mode="whatshap",
                                    exact_priorities=True)
    assert sparse == wh(W)
    # the approximate EdgeHeap-style refresh (the product default) may
    # reorder decisions on adversarial random weights; it must still
    # return a valid partition (planted-structure equality is covered by
    # test_planted_recovery_sparse_approx and the fast-path study)
    approx = cluster_editing_sparse(*_to_sparse(W), mode="whatshap")
    assert sorted(i for cl in approx for i in cl) == list(range(24))


def _native_trace(fn, capfd, monkeypatch):
    monkeypatch.setenv("AHSOKA_CE_TRACE", "1")
    fn()
    _, err = capfd.readouterr()
    return [line for line in err.splitlines() if line.startswith("W ")]


@pytest.mark.parametrize("seed", [0, 3])
def test_decision_trace_parity(seed, capfd, monkeypatch):
    """The dense native and the sparse native must take the oracle's
    decisions in the oracle's order, with the same icf/icp maxima.

    Weights are quantized to quarters (dyadic rationals): every icf/icp
    sum is then exact in float64 regardless of accumulation order, so
    the traces must match bit-for-bit — including genuine ties, which
    all three implementations must break lexicographically."""
    if not native_ce_available():
        pytest.skip("native cluster editing unavailable")
    groups = [list(range(0, 8)), list(range(8, 16))]
    W = _random_weights(16, seed, planted=groups)
    W = np.round(W * 4.0) / 4.0
    t_host = _native_trace(lambda: wh(W), capfd, monkeypatch)
    t_dense = _native_trace(
        lambda: cluster_editing_native(W, mode="whatshap"),
        capfd, monkeypatch)
    t_sparse = _native_trace(
        lambda: cluster_editing_sparse(*_to_sparse(W), mode="whatshap",
                                       exact_priorities=True),
        capfd, monkeypatch)
    assert t_host == t_dense
    assert t_host == t_sparse
    assert len(t_host) > 5


def test_mode_dispatch_and_validation():
    W = _random_weights(10, 0)
    assert cluster_editing(W, mode="whatshap") == wh(W)
    with pytest.raises(ValueError):
        cluster_editing(W, mode="nope")


def test_modes_can_differ():
    """The two rules are different algorithms; on adversarial weights
    they may produce different partitions (documenting they are not
    aliases).  On clean planted instances they agree."""
    groups = [list(range(0, 10)), list(range(10, 20))]
    W = _random_weights(20, 1, planted=groups)
    assert cluster_editing(W, mode="whatshap") == \
        cluster_editing(W, mode="fresh")
