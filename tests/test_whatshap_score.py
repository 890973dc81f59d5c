"""WhatsHap-published scoring mode (score/whatshap.py) — unit tests for
the multiplicity allocation, the p_s estimator, oracle properties, and
host/device/banded agreement."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.score.pairwise import readset_to_matrix, score_pairs
from ahsoka_tpu.score.whatshap import (chain_p_s, estimate_p_s,
                                       haplotype_multiplicities,
                                       p_differ_positions,
                                       score_pairs_whatshap)
from test_score_cluster import make_readset

CFG = PhasingConfig(score_mode="whatshap", estimate_error_rate=False)
CFG_EST = PhasingConfig(score_mode="whatshap")


def test_multiplicities_diploid_het():
    counts = np.array([[10.0, 10.0], [20.0, 0.0], [15.0, 5.0]])
    c = haplotype_multiplicities(counts, 2)
    assert c.tolist() == [[1, 1], [2, 0], [1, 1]]
    # 15:5 at ploidy 2: c=(1,1) has loglik 20*log(1/2); c=(2,0) has
    # 15*log(1) + 5*log(0) = -inf -> (1,1) is the ML allocation


def test_multiplicities_skewed_and_tetraploid():
    c = haplotype_multiplicities(np.array([[30.0, 10.0]]), 4)
    # ML over c0+c1=4, L = 30*log(c0/4) + 10*log(c1/4): c=(3,1)
    assert c.tolist() == [[3, 1]]
    c = haplotype_multiplicities(np.array([[10.0, 10.0, 20.0]]), 4)
    assert c.tolist() == [[1, 1, 2]]


def test_multiplicities_more_alleles_than_slots():
    # 3 observed alleles, 2 slots: the two largest counts get them
    c = haplotype_multiplicities(np.array([[5.0, 9.0, 7.0]]), 2)
    assert c.tolist() == [[0, 1, 1]]


def test_multiplicities_rows_sum_to_ploidy():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 40, size=(50, 4)).astype(float)
    for k in (2, 3, 4):
        c = haplotype_multiplicities(counts, k)
        assert (c.sum(axis=1) == k).all()


def test_p_differ_balanced_het_diploid():
    # 2 groups, balanced 0/1 alleles -> c=(1,1) -> distinct haplotypes
    # always differ
    rows = [[0, 0, 0]] * 4 + [[1, 1, 1]] * 4
    m = readset_to_matrix(make_readset(rows))
    assert np.allclose(p_differ_positions(m, 2), 1.0)
    # homozygous position: never differ
    rows = [[0, 0]] * 8
    m = readset_to_matrix(make_readset(rows))
    assert np.allclose(p_differ_positions(m, 2), 0.0)


def test_estimate_p_s_recovers_planted_error_rate():
    rng = np.random.default_rng(7)
    eps = 0.05
    rows = []
    for g in range(2):
        for _ in range(20):
            alleles = np.full(60, g)
            flips = rng.random(60) < eps
            alleles[flips] = 1 - alleles[flips]
            rows.append(alleles.tolist())
    m = readset_to_matrix(make_readset(rows))
    p_s = estimate_p_s(m, CFG_EST)
    # true same-hap disagreement rate = 2*eps*(1-eps) = 0.095
    assert 0.04 < p_s < 0.16


def test_score_signs_and_symmetry():
    rows = [[0, 0, 0, 0, 0, 0]] * 3 + [[1, 1, 1, 1, 1, 1]] * 3
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs_whatshap(m, CFG)
    assert s[0, 1] > 0 and s[3, 4] > 0
    assert s[0, 3] < 0 and s[2, 5] < 0
    assert np.allclose(s, s.T)
    assert np.allclose(np.diag(s), 0.0)


def test_score_zero_when_no_overlap_or_uninformative():
    rows = [[0, 0, -1, -1], [-1, -1, 1, 1]]
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs_whatshap(m, CFG)
    assert s[0, 1] == 0.0
    # all reads identical -> positions look homozygous -> p_d floors at
    # p_s -> score exactly 0 (uninformative, not attractive)
    rows = [[0, 0, 0]] * 4
    m = readset_to_matrix(make_readset(rows))
    s = score_pairs_whatshap(m, CFG)
    assert np.allclose(s, 0.0)


def test_dispatch_via_score_pairs():
    rows = [[0, 0, 0]] * 2 + [[1, 1, 1]] * 2
    m = readset_to_matrix(make_readset(rows))
    assert np.allclose(score_pairs(m, CFG), score_pairs_whatshap(m, CFG))
    fresh_cfg = PhasingConfig(score_mode="fresh",
                              estimate_error_rate=False)
    assert not np.allclose(score_pairs(m, fresh_cfg),
                           score_pairs_whatshap(m, CFG))


def test_chain_p_s_explicit_eps():
    rows = [[0, 0, 0]] * 4
    m = readset_to_matrix(make_readset(rows))
    p = chain_p_s(m, CFG, error_rate=0.07)
    assert np.isclose(p, 2 * 0.07 * 0.93)


@pytest.mark.parametrize("ploidy", [2, 4])
def test_device_matches_host_oracle(ploidy):
    from ahsoka_tpu.score.device import score_pairs_device

    rng = np.random.default_rng(3)
    rows = []
    for g in range(ploidy):
        for _ in range(8):
            alleles = np.full(12, g % 2)
            flips = rng.random(12) < 0.08
            alleles[flips] = 1 - alleles[flips]
            row = alleles.astype(int).tolist()
            # punch some coverage holes
            for j in rng.integers(0, 12, size=3):
                row[int(j)] = -1
            rows.append(row)
    cfg = PhasingConfig(score_mode="whatshap", ploidy=ploidy)
    m = readset_to_matrix(make_readset(rows))
    host = score_pairs_whatshap(m, cfg)
    dev = score_pairs_device(m, cfg)
    assert np.allclose(host, dev, atol=2e-3)


def test_device_many_matches_single():
    from ahsoka_tpu.score.device import (score_pairs_device,
                                         score_pairs_device_many)

    rng = np.random.default_rng(4)
    mats = []
    for n in (6, 10, 6):
        rows = [(rng.random(8) < 0.5).astype(int).tolist()
                for _ in range(n)]
        mats.append(readset_to_matrix(make_readset(rows)))
    many = score_pairs_device_many(mats, CFG_EST)
    for m, s in zip(mats, many):
        assert np.allclose(s, score_pairs_device(m, CFG_EST), atol=1e-5)


def test_banded_matches_dense_whatshap():
    from ahsoka_tpu.score.banded import score_pairs_banded

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        row = np.full(30, -1)
        start = (i * 30) // 45
        span = slice(start, min(start + 12, 30))
        hap = i % 2
        vals = np.full(row[span].shape, hap)
        flips = rng.random(vals.shape[0]) < 0.05
        vals[flips] = 1 - vals[flips]
        row[span] = vals
        rows.append(row.tolist())
    m = readset_to_matrix(make_readset(rows))
    dense = score_pairs_whatshap(m, CFG)
    eu, ev, ew = score_pairs_banded(m, CFG, block=16)
    sparse = np.zeros_like(dense)
    sparse[eu, ev] = ew
    sparse = sparse + sparse.T
    assert np.allclose(dense, sparse, atol=2e-3)
