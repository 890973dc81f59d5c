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


def test_native_covcap_matches_python_oracle():
    """native/covcap.cpp == the Python greedy, including the orphan and
    majority-under-cap rules, on a shape where the cap actually drops
    reads."""
    import numpy as np
    import ahsoka_tpu.project._native_covcap as nc
    import ahsoka_tpu.project.subsample as ss
    from ahsoka_tpu.score.pairwise import AlleleMatrix

    if nc._load() is None:
        import pytest
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(7)
    R, P, cap = 400, 30, 4
    alleles = np.full((R, P), -1, np.int16)
    for r in range(R):
        s = rng.integers(0, P - 3)
        alleles[r, s:s + 3] = rng.integers(0, 2, 3)
    m = AlleleMatrix(alleles=alleles,
                     positions=np.arange(P, dtype=np.int32),
                     read_names=[f"r{i}" for i in range(R)])
    sub_n, kept_n = ss.subsample_matrix(m, cap)
    saved_lib, saved_failed = nc._lib, nc._failed
    try:
        nc._lib, nc._failed = None, True        # force the Python path
        sub_p, kept_p = ss.subsample_matrix(m, cap)
    finally:
        nc._lib, nc._failed = saved_lib, saved_failed
    assert len(kept_n) < R                      # the cap really dropped
    assert np.array_equal(kept_n, kept_p)
    assert np.array_equal(sub_n.alleles, sub_p.alleles)
