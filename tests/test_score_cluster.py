"""Pairwise scoring and cluster editing."""

import numpy as np

from ahsoka_tpu.cluster.editing import cluster_editing
from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.readset import Read, ReadSet
from ahsoka_tpu.score.pairwise import readset_to_matrix, score_pairs

CFG = PhasingConfig(estimate_error_rate=False)


def make_readset(rows):
    rs = ReadSet()
    for i, alleles in enumerate(rows):
        r = Read(f"r{i}", 99)
        for p, a in enumerate(alleles):
            if a >= 0:
                r.add_variant(p, a)
        rs.add(r)
    return rs


def test_same_hap_positive_cross_negative():
    # two haplotype groups over 6 positions
    rows = [[0, 0, 0, 0, 0, 0]] * 3 + [[1, 1, 1, 1, 1, 1]] * 3
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs(m, CFG)
    assert s[0, 1] > 0 and s[0, 2] > 0 and s[3, 4] > 0
    assert s[0, 3] < 0 and s[2, 5] < 0
    assert np.allclose(s, s.T)
    assert np.allclose(np.diag(s), 0.0)


def test_min_overlap_zeroes_disjoint_pairs():
    rows = [[0, 0, -1, -1], [-1, -1, 1, 1]]
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs(m, CFG)
    assert s[0, 1] == 0.0


def test_cluster_editing_two_groups():
    rows = [[0, 0, 0, 0, 0, 0]] * 4 + [[1, 1, 1, 1, 1, 1]] * 4
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs(m, CFG)
    clusters = cluster_editing(s)
    assert sorted(map(tuple, clusters)) == [(0, 1, 2, 3), (4, 5, 6, 7)]


def test_cluster_editing_with_noise():
    rng = np.random.default_rng(0)
    rows = []
    for g in range(2):
        for _ in range(6):
            alleles = [g] * 10
            flip = rng.integers(0, 10)
            alleles[flip] = 1 - g          # one error per read
            rows.append(alleles)
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs(m, CFG)
    clusters = cluster_editing(s)
    big = sorted([c for c in clusters if len(c) >= 4], key=lambda c: c[0])
    assert len(big) == 2
    assert all(r < 6 for r in big[0]) and all(r >= 6 for r in big[1])


def test_cluster_editing_empty_and_singleton():
    assert cluster_editing(np.zeros((0, 0))) == []
    assert cluster_editing(np.zeros((1, 1))) == [[0]]
    # all-negative weights: no merging
    w = -np.ones((3, 3))
    np.fill_diagonal(w, 0)
    assert cluster_editing(w) == [[0], [1], [2]]
