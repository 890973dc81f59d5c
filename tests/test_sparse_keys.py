"""SparseKeys COO views (project/device.py): the winner-table form the
blocked big-chain path carries end to end."""

import numpy as np

from ahsoka_tpu.project.device import NO_MATCH, SparseKeys, table_coo


def _rand_table(shape, nnz, seed=0):
    rng = np.random.default_rng(seed)
    dense = np.full(shape, NO_MATCH, dtype=np.int32)
    idx = rng.choice(shape[0] * shape[1], size=nnz, replace=False)
    r, c = np.unravel_index(np.sort(idx), shape)
    dense[r, c] = rng.integers(0, 1 << 20, size=nnz)
    return dense, SparseKeys(shape, r.astype(np.int64),
                             c.astype(np.int64), dense[r, c])


def test_round_trip_and_coo():
    dense, sk = _rand_table((40, 60), 100)
    assert np.array_equal(sk.to_dense(), dense)
    r, c, v = table_coo(sk)
    rd, cd, vd = table_coo(dense)
    assert np.array_equal(r, rd) and np.array_equal(c, cd)
    assert np.array_equal(v, vd)


def test_row_slice_matches_dense():
    dense, sk = _rand_table((40, 60), 150, seed=1)
    for lo, hi in ((0, 40), (5, 25), (30, 40), (12, 13)):
        assert np.array_equal(sk.row_slice(lo, hi).to_dense(),
                              dense[lo:hi])


def test_row_subset_matches_dense():
    dense, sk = _rand_table((40, 60), 150, seed=2)
    for rows in ([0, 3, 7, 39], [2], list(range(0, 40, 5))):
        rows = np.asarray(rows)
        assert np.array_equal(sk.row_subset(rows).to_dense(),
                              dense[rows])


def test_empty_subset():
    _, sk = _rand_table((10, 10), 8, seed=3)
    sub = sk.row_subset(np.asarray([], dtype=np.int64))
    assert sub.to_dense().shape == (0, 10)
    assert len(sub.r) == 0
