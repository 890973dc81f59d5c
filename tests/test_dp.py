"""Haplotype-threading DP: oracle vs brute force, row continuity."""

import numpy as np
import pytest

from ahsoka_tpu.cluster.postprocess import DPInputs, default_genotypes
from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread.dp_host import (assign_rows, brute_force_thread,
                                       node_costs, thread_and_assign,
                                       thread_chain, transition_costs)
from ahsoka_tpu.thread.states import (full_state_counts,
                                      full_state_validity, max_states,
                                      num_states, state_counts,
                                      state_tuples)


def random_dp_inputs(P, ploidy, num_clusters, seed):
    rng = np.random.default_rng(seed)
    M = 2 * ploidy
    candidates = np.full((P, M), -1, dtype=np.int32)
    num_candidates = np.zeros(P, dtype=np.int32)
    coverage = np.zeros((P, M), dtype=np.float32)
    consensus = np.zeros((P, M), dtype=np.int32)
    for j in range(P):
        m = int(rng.integers(1, M + 1))
        chosen = rng.choice(num_clusters, size=min(m, num_clusters),
                            replace=False)
        m = len(chosen)
        num_candidates[j] = m
        candidates[j, :m] = np.sort(chosen)
        cov = rng.random(m) + 0.05
        coverage[j, :m] = cov / cov.sum()
        consensus[j, :m] = rng.integers(0, 2, size=m)
    return DPInputs(positions=np.arange(P, dtype=np.int32),
                    candidates=candidates, num_candidates=num_candidates,
                    coverage=coverage, consensus=consensus,
                    genotypes=default_genotypes(P, ploidy))


def test_state_space_sizes():
    assert num_states(4, 2) == 10
    assert num_states(8, 4) == 330
    assert max_states(2) == 10
    assert state_counts(3, 2).shape == (6, 3)
    assert state_tuples(2, 2) == ((0, 0), (0, 1), (1, 1))
    assert full_state_counts(2).shape == (10, 4)
    # a state referencing slot 1 needs at least 2 candidates
    assert not full_state_validity(2)[1, 1]
    assert full_state_validity(2)[2, 1]


@pytest.mark.parametrize("seed", range(5))
def test_dp_matches_brute_force_diploid(seed):
    cfg = PhasingConfig(ploidy=2)
    dp = random_dp_inputs(P=5, ploidy=2, num_clusters=5, seed=seed)
    best_cost, best_path = brute_force_thread(dp, cfg)
    path = thread_chain(dp, cfg)
    # recompute the DP path's cost and compare to the optimum
    cost = _path_cost(dp, path, cfg)
    assert cost == pytest.approx(best_cost, abs=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_dp_matches_brute_force_triploid(seed):
    cfg = PhasingConfig(ploidy=3)
    dp = random_dp_inputs(P=4, ploidy=3, num_clusters=4, seed=seed)
    best_cost, _ = brute_force_thread(dp, cfg)
    path = thread_chain(dp, cfg)
    assert _path_cost(dp, path, cfg) == pytest.approx(best_cost, abs=1e-9)


def _path_cost(dp, path, cfg):
    from collections import Counter
    valid = full_state_validity(cfg.ploidy)
    total = 0.0
    for j, tup in enumerate(path):
        m = int(dp.num_candidates[j])
        # find the state index for this cluster-id multiset
        target = sorted(tup)
        for s, slots in enumerate(state_tuples(2 * cfg.ploidy, cfg.ploidy)):
            if not valid[m, s]:
                continue
            if sorted(int(dp.candidates[j, sl]) for sl in slots) == target:
                total += node_costs(dp, j, cfg)[s]
                break
        else:
            raise AssertionError("state not found")
        if j > 0:
            prev, cur = Counter(path[j - 1]), Counter(tup)
            inter = sum((prev & cur).values())
            s_ = cfg.ploidy - inter
            total += cfg.switch_cost * s_ + cfg.affine_switch_cost * (s_ > 0)
    return total


def test_assign_rows_continuity():
    path = [(1, 2), (1, 2), (2, 3), (3, 3)]
    rows = assign_rows(path, 2)
    assert rows[0] == (1, 2)
    assert rows[1] == (1, 2)
    # cluster 2 persists on row 1; new cluster 3 takes row 0
    assert rows[2] == (3, 2)
    assert rows[3] == (3, 3)


def test_switch_cost_prefers_continuity():
    cfg = PhasingConfig(ploidy=2)
    P = 4
    candidates = np.full((P, 4), -1, dtype=np.int32)
    candidates[:, :2] = [0, 1]
    coverage = np.zeros((P, 4), dtype=np.float32)
    coverage[:, :2] = 0.5
    consensus = np.zeros((P, 4), dtype=np.int32)
    consensus[:, 1] = 1
    dp = DPInputs(positions=np.arange(P, dtype=np.int32),
                  candidates=candidates,
                  num_candidates=np.full(P, 2, dtype=np.int32),
                  coverage=coverage, consensus=consensus,
                  genotypes=default_genotypes(P, 2))
    path = thread_and_assign(dp, cfg)
    assert path == [(0, 1)] * P    # balanced, heterozygous, no switches


@pytest.mark.parametrize("seed", range(3))
def test_associative_scan_cost_optimal(seed):
    """Log-depth min-plus scan path costs equal the sequential optimum."""
    from ahsoka_tpu.thread.dp_assoc import thread_chain_assoc
    cfg = PhasingConfig(ploidy=2)
    dp = random_dp_inputs(P=12, ploidy=2, num_clusters=5, seed=seed)
    seq = thread_chain(dp, cfg)
    assoc = thread_chain_assoc(dp, cfg)
    assert _path_cost(dp, assoc, cfg) == \
        pytest.approx(_path_cost(dp, seq, cfg), rel=1e-5)
