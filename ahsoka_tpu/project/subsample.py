"""Coverage subsampling for deep chains.

Deep read coverage makes the pair-similarity graph quadratically dense
(each read overlaps ~coverage x span neighbours), which dominates scoring
and cluster-editing cost.  Capping per-position coverage before scoring is
standard phasing practice.  The greedy keeps a read (in readset order, i.e.
ascending first position) when at least half of its positions are still
under the cap — requiring only *one* under-cap position degenerates for
position-sorted readsets, where every read's rightmost position is always
fresh."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ahsoka_tpu.score.pairwise import AlleleMatrix


def subsample_matrix(matrix: AlleleMatrix, cap: int
                     ) -> Tuple[AlleleMatrix, np.ndarray]:
    """Returns (subsampled matrix, kept row indices)."""
    alleles = matrix.alleles
    R, P = alleles.shape
    cov = np.zeros(P, dtype=np.int64)
    keep = np.zeros(R, dtype=bool)
    covered = alleles >= 0
    for i in range(R):
        pos = np.nonzero(covered[i])[0]
        if len(pos) and ((cov[pos] < cap).mean() >= 0.5
                         or (cov[pos] == 0).any()):
            # majority-under-cap, or the read is the first coverage for
            # some position (never orphan a position)
            keep[i] = True
            cov[pos] += 1
    kept = np.nonzero(keep)[0]
    # positions may lose all coverage only if cap == 0; keep shape simple
    sub = AlleleMatrix(
        alleles=np.ascontiguousarray(alleles[kept]),
        positions=matrix.positions,
        read_names=[matrix.read_names[i] for i in kept])
    return sub, kept
