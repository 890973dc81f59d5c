"""Identical-read collapsing (project/collapse.py): the weighted
statistics must reproduce the full-matrix estimators exactly, and the
collapsed cluster-editing path must agree with the exact solver on
realistic chains."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.collapse import (CollapsedReads, collapse_reads,
                                         expand_clusters)
from ahsoka_tpu.score.pairwise import (AlleleMatrix, estimate_error_rate,
                                       score_pairs)
from ahsoka_tpu.score.whatshap import (estimate_p_s,
                                       estimate_p_s_weighted)

CFG = PhasingConfig(debug_readset_files=False)


def _random_matrix(R=60, P=12, dup_factor=3, seed=0):
    """Matrix with planted duplicate rows."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-1, 2, size=(R // dup_factor, P)).astype(np.int16)
    rows = base[rng.integers(0, len(base), size=R)]
    # ensure every row covers >= 2 positions
    rows[:, 0] = np.abs(rows[:, 0])
    rows[:, 1] = np.abs(rows[:, 1])
    return AlleleMatrix(alleles=rows,
                        positions=np.arange(P, dtype=np.int32),
                        read_names=[f"r{i}" for i in range(R)])


def test_collapse_round_trip():
    m = _random_matrix()
    cm = collapse_reads(m)
    assert cm.num_groups < m.num_reads
    assert cm.mult.sum() == m.num_reads
    # every read's row equals its group's representative row
    assert (m.alleles == cm.matrix.alleles[cm.inverse]).all()
    # groups are distinct
    assert len(np.unique(cm.matrix.alleles, axis=0)) == cm.num_groups


def test_weighted_p_s_equals_full():
    m = _random_matrix(R=80, P=10, dup_factor=4, seed=1)
    cm = collapse_reads(m)
    full = estimate_p_s(m, CFG)
    weighted = estimate_p_s_weighted(cm.matrix, cm.mult, CFG)
    assert weighted == pytest.approx(full, abs=0.0), \
        f"{weighted} != {full}"


def test_weighted_eps_equals_full():
    m = _random_matrix(R=80, P=10, dup_factor=4, seed=2)
    cm = collapse_reads(m)
    full = estimate_error_rate(m, CFG)
    weighted = estimate_error_rate(cm.matrix, CFG, mult=cm.mult)
    assert weighted == pytest.approx(full, rel=1e-12)


@pytest.mark.parametrize("mode", ["whatshap", "fresh"])
def test_weighted_host_scores_equal_full(mode):
    """score(full)[i, j] == score(collapsed, mult)[g(i), g(j)] exactly:
    the per-position statistics are weighted, the pairwise part depends
    only on the two rows."""
    cfg = PhasingConfig(debug_readset_files=False, score_mode=mode)
    m = _random_matrix(R=60, P=12, dup_factor=3, seed=3)
    cm = collapse_reads(m)
    s_full = score_pairs(m, cfg)
    s_grp = score_pairs(cm.matrix, cfg, mult=cm.mult)
    for i in range(0, m.num_reads, 7):
        for j in range(0, m.num_reads, 5):
            gi, gj = cm.inverse[i], cm.inverse[j]
            if gi == gj:
                continue                      # merged pair: no edge
            assert s_full[i, j] == pytest.approx(s_grp[gi, gj],
                                                 rel=1e-12)


def test_weighted_device_scores_equal_host():
    from ahsoka_tpu.score.device import score_pairs_device

    m = _random_matrix(R=60, P=12, dup_factor=3, seed=4)
    cm = collapse_reads(m)
    host = score_pairs(cm.matrix, CFG, mult=cm.mult)
    dev = score_pairs_device(cm.matrix, CFG, mult=cm.mult.astype(float))
    assert np.allclose(host, dev, atol=2e-3)


def test_expand_clusters_convention():
    cm = CollapsedReads(
        matrix=None,
        inverse=np.array([1, 0, 1, 2, 0], dtype=np.int32),
        mult=np.array([2, 2, 1]))
    # group cluster {g1} -> reads {0, 2}; {g0, g2} -> reads {1, 3, 4}
    out = expand_clusters([[1], [0, 2]], cm.inverse)
    assert out == [[0, 2], [1, 3, 4]]


def test_banded_weighted_edges_match_dense_weighted_scores():
    """score_pairs_banded(collapsed, mult) must produce the same pair
    scores as the dense weighted oracle on the covered band."""
    from ahsoka_tpu.score.banded import score_pairs_banded

    rng = np.random.default_rng(9)
    R, P = 300, 40
    rows = np.full((R, P), -1, dtype=np.int16)
    for r in range(R):
        s = (r * P) // (R + 4)          # ordered by first position
        s = min(s, P - 3)
        rows[r, s:s + 3] = rng.integers(0, 2, size=3)
    m = AlleleMatrix(alleles=rows,
                     positions=np.arange(P, dtype=np.int32),
                     read_names=[f"r{i}" for i in range(R)])
    cm = collapse_reads(m)
    dense = score_pairs(cm.matrix, CFG, mult=cm.mult)
    eu, ev, ew = score_pairs_banded(cm.matrix, CFG, block=64,
                                    mult=cm.mult)
    assert len(ew) > 0
    for u, v, w in zip(eu[:500], ev[:500], ew[:500]):
        assert w == pytest.approx(dense[u, v], abs=2e-3)


def test_low_redundancy_chains_skip_collapse():
    """The redundancy gate (ce_collapse_max_ratio): chains whose rows
    are mostly unique run the exact uncollapsed path — the regime where
    the study found the contract violation."""
    import dataclasses

    from ahsoka_tpu.phase import _chain_collapse

    rng = np.random.default_rng(11)
    R, P = 600, 200
    rows = np.full((R, P), -1, dtype=np.int16)
    for r in range(R):
        s = rng.integers(0, P - 4)
        # 4 random alleles: essentially every row unique
        rows[r, s:s + 4] = rng.integers(0, 2, size=4)
    m = AlleleMatrix(alleles=rows,
                     positions=np.arange(P, dtype=np.int32),
                     read_names=[f"r{i}" for i in range(R)])
    cfg = dataclasses.replace(CFG, ce_collapse_min_reads=128)
    assert _chain_collapse(m, cfg) is None
    # and a redundant chain still collapses
    dup = AlleleMatrix(alleles=np.repeat(rows[:60], 10, axis=0),
                       positions=m.positions,
                       read_names=[f"d{i}" for i in range(600)])
    cm = _chain_collapse(dup, cfg)
    assert cm is not None and cm.num_groups <= 60


def test_banded_collapsed_matches_banded_uncollapsed():
    """The banded-collapsed path (weighted stats over distinct rows,
    m_u*m_v edge weights, group-sparse CE, expansion) must cluster like
    the uncollapsed banded path."""
    import dataclasses

    from ahsoka_tpu.cluster.editing import assignment_from_clusters
    from ahsoka_tpu.phase import (ChainPhasingResult,
                                  _chain_cluster_dp_stage)

    rng = np.random.default_rng(7)
    R, P = 600, 30
    hap = rng.integers(0, 2, size=R)
    rows = np.full((R, P), -1, dtype=np.int16)
    for r in range(R):
        s = rng.integers(0, P - 3)
        rows[r, s:s + 3] = hap[r]
        if rng.random() < 0.05:
            rows[r, s + 1] ^= 1
    m = AlleleMatrix(alleles=rows,
                     positions=np.arange(P, dtype=np.int32),
                     read_names=[f"r{i}" for i in range(R)])
    # order rows by first covered position (the pipeline's invariant)
    order = np.argsort((rows >= 0).argmax(axis=1), kind="stable")
    m = AlleleMatrix(alleles=rows[order],
                     positions=m.positions,
                     read_names=[m.read_names[i] for i in order])

    base = dataclasses.replace(CFG, banded_scoring_threshold=64,
                               ce_collapse_min_reads=128)
    res_c = ChainPhasingResult(chain_id=0, num_bubbles=P, skipped=True)
    dp_c = _chain_cluster_dp_stage(m, base, res_c)
    res_u = ChainPhasingResult(chain_id=0, num_bubbles=P, skipped=True)
    dp_u = _chain_cluster_dp_stage(
        m, dataclasses.replace(base, ce_collapse_identical=False),
        res_u)
    assert dp_c is not None and dp_u is not None
    # both paths find the same haplotype structure
    assert res_c.num_clusters <= res_u.num_clusters + 3
    assert np.array_equal(dp_c.positions, dp_u.positions)
    assert np.allclose(dp_c.consensus[:, :2], dp_u.consensus[:, :2])
    _ = assignment_from_clusters  # noqa: F841


def test_collapsed_ce_matches_exact_on_synthetic_chain():
    """Config4-shaped chain: the collapsed weighted CE path must give
    the same final clusters as the exact uncollapsed solver."""
    from ahsoka_tpu.cluster.editing import cluster_editing

    rng = np.random.default_rng(5)
    R, P = 400, 20
    hap = rng.integers(0, 2, size=R)
    rows = np.full((R, P), -1, dtype=np.int16)
    for r in range(R):
        s = rng.integers(0, P - 3)
        rows[r, s:s + 3] = hap[r]
        if rng.random() < 0.05:
            rows[r, s + 1] ^= 1
    m = AlleleMatrix(alleles=rows,
                     positions=np.arange(P, dtype=np.int32),
                     read_names=[f"r{i}" for i in range(R)])
    exact_scores = score_pairs(m, CFG)
    exact = cluster_editing(exact_scores, mode="whatshap")

    cm = collapse_reads(m)
    s_grp = score_pairs(cm.matrix, CFG, mult=cm.mult)
    w = s_grp * np.outer(cm.mult, cm.mult)
    np.fill_diagonal(w, 0.0)
    grp = cluster_editing(w, mode="whatshap")
    got = expand_clusters(grp, cm.inverse)
    assert got == exact
