"""Coverage subsampling."""

import numpy as np

from ahsoka_tpu.project.subsample import subsample_matrix
from ahsoka_tpu.score.pairwise import AlleleMatrix


def _banded_matrix(R=2000, P=100, span=8, seed=0):
    rng = np.random.default_rng(seed)
    alleles = np.full((R, P), -1, dtype=np.int16)
    starts = np.sort(rng.integers(0, P - span, size=R))
    for i in range(R):
        alleles[i, starts[i]:starts[i] + span] = rng.integers(0, 2)
    return AlleleMatrix(alleles=alleles,
                        positions=np.arange(P, dtype=np.int32),
                        read_names=[f"r{i}" for i in range(R)])


def test_cap_reduces_coverage():
    m = _banded_matrix()
    sub, kept = subsample_matrix(m, 16)
    assert sub.num_reads < m.num_reads * 0.5
    cov = (sub.alleles >= 0).sum(axis=0)
    # no position loses coverage entirely, and coverage is bounded by
    # cap + span slack
    orig_cov = (m.alleles >= 0).sum(axis=0)
    assert ((cov > 0) | (orig_cov == 0)).all()
    assert cov.max() <= 16 * 2 + 8   # cap + majority-rule slack


def test_cap_noop_when_shallow():
    m = _banded_matrix(R=50)
    sub, kept = subsample_matrix(m, 64)
    assert sub.num_reads == m.num_reads
