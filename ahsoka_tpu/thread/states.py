"""DP state space: multisets of `ploidy` clusters per position.

The threading DP's states at a position are multisets (tuples with
repetition) of size `ploidy` drawn from that position's candidate clusters
(between ploidy and 2*ploidy of them) — the reference's WhatsHap
HaploThreader state model (src/alignmentstoreadset.cpp:319-409 call site,
SURVEY.md §2b).  For m candidates and ploidy k there are C(m+k-1, k)
states; with m <= 2k that is 10 for diploid and 330 for tetraploid.

States are enumerated in lexicographic order of candidate-slot indices
(itertools.combinations_with_replacement), giving a static count-matrix
layout per (m, k) that the device DP reuses across positions and chains.
"""

from __future__ import annotations

import functools
import itertools
from math import comb
from typing import List, Tuple

import numpy as np


@functools.lru_cache(maxsize=None)
def state_tuples(num_candidates: int, ploidy: int
                 ) -> Tuple[Tuple[int, ...], ...]:
    """All multisets of size `ploidy` over slots 0..num_candidates-1."""
    return tuple(itertools.combinations_with_replacement(
        range(num_candidates), ploidy))


@functools.lru_cache(maxsize=None)
def state_counts(num_candidates: int, ploidy: int) -> np.ndarray:
    """[S, m] multiplicity of each candidate slot in each state."""
    tuples = state_tuples(num_candidates, ploidy)
    counts = np.zeros((len(tuples), num_candidates), dtype=np.int8)
    for s, t in enumerate(tuples):
        for slot in t:
            counts[s, slot] += 1
    return counts


def num_states(num_candidates: int, ploidy: int) -> int:
    return comb(num_candidates + ploidy - 1, ploidy)


def max_states(ploidy: int) -> int:
    """State-space size at the 2*ploidy candidate cap."""
    return num_states(2 * ploidy, ploidy)


@functools.lru_cache(maxsize=None)
def padded_state_counts(ploidy: int) -> np.ndarray:
    """[m_max+1, S_max, m_max] state count matrices for every candidate
    count m (index 0 unused), padded with -1-free zeros; invalid states
    (s >= num_states(m, k)) are all-zero rows.  This is the static table
    the batched device DP indexes by m."""
    m_max = 2 * ploidy
    s_max = max_states(ploidy)
    table = np.zeros((m_max + 1, s_max, m_max), dtype=np.int8)
    for m in range(1, m_max + 1):
        counts = state_counts(m, ploidy)
        table[m, :counts.shape[0], :m] = counts
    return table


def state_cluster_ids(candidates: np.ndarray, m: int, ploidy: int
                      ) -> List[Tuple[int, ...]]:
    """Map slot-index states to cluster-id multisets for one position."""
    return [tuple(int(candidates[slot]) for slot in t)
            for t in state_tuples(m, ploidy)]
