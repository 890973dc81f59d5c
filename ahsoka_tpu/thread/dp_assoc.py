"""Log-depth threading DP via associative min-plus scan.

The threading recurrence is a min-plus (tropical) matrix product: with

    T_j[s, s'] = switch_cost(j-1 -> j)[s, s'] + node_j[s']

the forward cost at position j is ``node_0 (x) T_1 (x) ... (x) T_j`` where
``(x)`` is min-plus matrix multiplication — an associative operator.  A
``jax.lax.associative_scan`` over the T_j therefore computes every prefix
in O(log P) depth instead of the O(P) sequential scan — the long-chain
scaling story from SURVEY.md §5 ("the DP is associative in min-plus
algebra over per-position transition matrices").

Cost: O(P S^3) work vs the sequential scan's O(P S^2), so this wins when
the position count (not the work) is the limit — very long chains on many
cores.  The returned path has *equal cost* to the sequential oracle's;
tie-broken state choices may differ (tests assert cost equality and
validity, not identical tie picks).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ahsoka_tpu.cluster.postprocess import DPInputs
from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread.dp_jax import _INF, node_costs_all
from ahsoka_tpu.thread.states import (full_state_counts,
                                      full_state_validity, state_tuples)


def _minplus_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., S, S] (x) [..., S, S] in min-plus algebra."""
    return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)


@functools.partial(jax.jit, static_argnames=("ploidy", "num_alleles"))
def _assoc_forward(candidates, num_candidates, coverage, consensus,
                   genotypes, counts_table, valid_table, ploidy: int,
                   num_alleles: int, switch_cost, affine_cost, cov_w,
                   geno_w):
    P, M = candidates.shape
    S = counts_table.shape[0]
    k = ploidy
    node, countsf = node_costs_all(
        candidates, num_candidates, coverage, consensus, genotypes,
        counts_table, valid_table, ploidy, num_alleles, cov_w, geno_w)
    counts_i = countsf.astype(jnp.int32)

    # batched switch matrices for steps 1..P-1
    cand_prev, cand_cur = candidates[:-1], candidates[1:]
    match = ((cand_prev[:, :, None] == cand_cur[:, None, :])
             & (cand_prev[:, :, None] >= 0)).astype(jnp.int32)
    # mapped[p, s', m_prev] = sum_q counts[s', q] * match[p, m_prev, q]
    mapped = jnp.einsum("sq,pmq->psm", counts_i, match)
    inter = jnp.minimum(counts_i[None, :, None, :],
                        mapped[:, None, :, :]).sum(axis=-1)  # [P-1, S, S']
    switches = (k - inter).astype(jnp.float32)
    trans = switch_cost * switches + affine_cost * (switches > 0)
    T = trans + node[1:][:, None, :]                      # [P-1, S, S']

    prefixes = jax.lax.associative_scan(_minplus_matmul, T)  # [P-1, S, S]
    # forward cost at position j>0: min_s node0[s] + prefix_{j}[s, s']
    fwd_tail = jnp.min(node[0][None, :, None] + prefixes, axis=1)
    fwd = jnp.concatenate([node[0][None, :], fwd_tail])    # [P, S]
    return fwd, T


def thread_chain_assoc(dp: DPInputs, config: PhasingConfig
                       ) -> List[Tuple[int, ...]]:
    """Min-cost multiset path (cost-optimal; ties may differ from the
    sequential oracle)."""
    P = dp.num_positions
    if P == 0:
        return []
    k = config.ploidy
    counts_table = full_state_counts(k)
    valid_table = full_state_validity(k)
    A = dp.genotypes.shape[1]
    fwd, T = _assoc_forward(
        jnp.asarray(dp.candidates), jnp.asarray(dp.num_candidates),
        jnp.asarray(dp.coverage, dtype=jnp.float32),
        jnp.asarray(dp.consensus),
        jnp.asarray(dp.genotypes, dtype=jnp.float32),
        jnp.asarray(counts_table), jnp.asarray(valid_table),
        ploidy=k, num_alleles=A,
        switch_cost=jnp.float32(config.switch_cost),
        affine_cost=jnp.float32(config.affine_switch_cost),
        cov_w=jnp.float32(config.coverage_cost_weight),
        geno_w=jnp.float32(config.genotype_cost_weight
                           if config.use_genotypes else 0.0))
    fwd = np.asarray(fwd)
    T = np.asarray(T)
    # greedy backtrace on the forward costs (T already includes node costs)
    states = np.zeros(P, dtype=np.int64)
    states[P - 1] = int(np.argmin(fwd[P - 1]))
    for j in range(P - 2, -1, -1):
        states[j] = int(np.argmin(fwd[j] + T[j][:, states[j + 1]]))
    tuples = state_tuples(2 * k, k)
    path = []
    for j in range(P):
        slots = tuples[int(states[j])]
        path.append(tuple(int(dp.candidates[j, slot]) for slot in slots))
    return path
