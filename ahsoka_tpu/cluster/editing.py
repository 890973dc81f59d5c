"""Cluster editing of the read-similarity graph.

Role parity: the reference runs WhatsHap's ``ClusterEditingSolver(sim,
false).run()`` (src/alignmentstoreadset.cpp:312-314) — a greedy
induced-cost heuristic (icf/icp) that partitions reads into clusters by
making edges permanent (merging) or forbidden.

This is a fresh implementation of the induced-cost greedy (Boecker-style
cluster editing) on a dense weight matrix, chosen because the heuristic is
inherently sequential and runs on the host (SURVEY.md §7 layer 5); the
TPU-side pipeline treats the resulting cluster assignment as input to the
threading DP.  For every undecided positive edge (u, v):

    icf(u,v) = relu(w_uv) + sum_z relu(min(w_uz, w_vz))
               # cost of forbidding: lose the attraction, and every common
               # positive neighbour must give up one of its attractions
    icp(u,v) = relu(-w_uv) + sum_z [sign conflict] min(|w_uz|, |w_vz|)
               # cost of merging: overcome the repulsion, and every
               # sign-conflicted neighbour costs the smaller |weight|

The edge with the largest max(icf, icp) is decided first: merge when
icf >= icp (weights add), else forbid (weight -> -inf).  Terminates when no
positive edge remains; clusters are the merged groups plus singletons,
ordered by smallest member read index.

Determinism: ties in the priority pick the lexicographically smallest
(u, v).  Complexity is O(n^2) per merge with incrementally maintained
neighbour sums; the native C++ path (native/) takes over for large chains.
"""

from __future__ import annotations

from typing import List

import numpy as np

FORBIDDEN = -1.0e18


def cluster_editing(weights: np.ndarray,
                    prefer_native: bool = True) -> List[List[int]]:
    """Partition reads given a symmetric score matrix (diagonal ignored).

    Returns clusters as lists of original read indices, ordered by smallest
    member; members ascending.  Uses the native C++ implementation
    (native/cluster_editing.cpp, identical results — parity-tested) when
    available; this Python body is the oracle and fallback.
    """
    if prefer_native and weights.shape[0] > 64:
        from ahsoka_tpu.cluster._native_ce import (cluster_editing_native,
                                                   cluster_editing_sparse)
        n = weights.shape[0]
        iu = np.triu_indices(n, k=1)
        mask = weights[iu] != 0
        density = float(mask.mean()) if mask.size else 0.0
        if n > 1500 or density < 0.15:
            # The read-similarity graph is position-local, so most chains
            # are sparse (reads overlapping in <minOverlap positions score
            # 0 and are absent edges, like WhatsHap's TriangleSparseMatrix)
            # — the adjacency+lazy-heap solver wins by ~20x there, and the
            # dense quadratic memory hurts for large chains.  Dense is
            # kept for small/dense matrices where heap churn dominates.
            sparse = cluster_editing_sparse(
                n, iu[0][mask], iu[1][mask], weights[iu][mask])
            if sparse is not None:
                return sparse
        native = cluster_editing_native(weights)
        if native is not None:
            return native
    n = weights.shape[0]
    if n == 0:
        return []
    W = weights.astype(np.float64).copy()
    np.fill_diagonal(W, 0.0)
    alive = np.ones(n, dtype=bool)
    members: List[List[int]] = [[i] for i in range(n)]

    relu = lambda x: np.maximum(x, 0.0)

    def contrib_f(z: int) -> np.ndarray:
        col = W[:, z] * alive[z]
        return relu(np.minimum.outer(col, col))

    def contrib_p(z: int) -> np.ndarray:
        col = W[:, z] * alive[z]
        pos, neg = col > 0, col < 0
        conflict = np.logical_or(np.logical_and.outer(pos, neg),
                                 np.logical_and.outer(neg, pos))
        return conflict * np.minimum.outer(np.abs(col), np.abs(col))

    # SumF/SumP include z == u, v: those terms are provably zero for the
    # pair (u, v) itself (min with the zero diagonal), so no exclusion is
    # needed when reading icf/icp off the matrices.
    sum_f = np.zeros((n, n))
    sum_p = np.zeros((n, n))
    for z in range(n):
        sum_f += contrib_f(z)
        sum_p += contrib_p(z)

    def update_z(z: int, old_f: np.ndarray, old_p: np.ndarray) -> None:
        sum_f[...] += contrib_f(z) - old_f
        sum_p[...] += contrib_p(z) - old_p

    iu = np.triu_indices(n, k=1)
    while True:
        undecided = (W > 0) & alive[:, None] & alive[None, :]
        if not undecided[iu].any():
            break
        icf = relu(W) + sum_f
        icp = relu(-W) + sum_p
        priority = np.where(np.triu(undecided, 1),
                            np.maximum(icf, icp), -np.inf)
        # argmax in row-major order == lexicographically smallest (u, v) tie
        u, v = divmod(int(np.argmax(priority)), n)
        if icf[u, v] >= icp[u, v]:
            _merge(W, alive, members, sum_f, sum_p, contrib_f, contrib_p,
                   u, v)
        else:
            old_fu, old_pu = contrib_f(u), contrib_p(u)
            old_fv, old_pv = contrib_f(v), contrib_p(v)
            W[u, v] = W[v, u] = FORBIDDEN
            update_z(u, old_fu, old_pu)
            update_z(v, old_fv, old_pv)

    clusters = [sorted(members[i]) for i in range(n) if alive[i]]
    clusters.sort(key=lambda c: c[0])
    return clusters


def _merge(W, alive, members, sum_f, sum_p, contrib_f, contrib_p,
           u: int, v: int) -> None:
    old_fu, old_pu = contrib_f(u), contrib_p(u)
    old_fv, old_pv = contrib_f(v), contrib_p(v)
    merged = W[u] + W[v]
    merged[u] = 0.0
    W[u, :] = merged
    W[:, u] = merged
    W[v, :] = 0.0
    W[:, v] = 0.0
    alive[v] = False
    members[u].extend(members[v])
    members[v] = []
    # contributions OF columns u and v changed for every pair ...
    sum_f[...] += contrib_f(u) - old_fu
    sum_p[...] += contrib_p(u) - old_pu
    sum_f[...] += contrib_f(v) - old_fv
    sum_p[...] += contrib_p(v) - old_pv
    # ... and every pair (u, y) changed through every OTHER column z,
    # because row u of W was rewritten: recompute those sums fresh
    _recompute_pair_row(W, alive, sum_f, sum_p, u)


def _recompute_pair_row(W, alive, sum_f, sum_p, u: int) -> None:
    """Fresh sum_f/sum_p for all pairs (u, y):
    sum_f[u, y] = sum_z relu(min(W[u, z], W[y, z])) over alive z."""
    Wa = W * alive[None, :]
    wu = Wa[u]                                # [n]
    f = np.maximum(np.minimum(wu[None, :], Wa), 0.0)   # [n(y), n(z)]
    row_f = f.sum(axis=1)
    conflict = np.logical_or(
        np.logical_and(wu[None, :] > 0, Wa < 0),
        np.logical_and(wu[None, :] < 0, Wa > 0))
    p = conflict * np.minimum(np.abs(wu)[None, :], np.abs(Wa))
    row_p = p.sum(axis=1)
    sum_f[u, :] = row_f
    sum_f[:, u] = row_f
    sum_p[u, :] = row_p
    sum_p[:, u] = row_p


def assignment_from_clusters(clusters: List[List[int]],
                             num_reads: int) -> np.ndarray:
    out = np.full(num_reads, -1, dtype=np.int32)
    for cid, cluster in enumerate(clusters):
        for r in cluster:
            out[r] = cid
    return out
