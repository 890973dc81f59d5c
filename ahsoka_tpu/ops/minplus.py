"""Pallas TPU kernel: batched min-plus (Viterbi) scan for the threading DP.

The pipeline's flagship kernel (SURVEY.md §7 layer 6): threads ploidy
haplotypes through per-position candidate clusters for a *block of chains
at once*.  Layout puts the chain batch on the 128-lane axis so every VPU op
processes 128 chains in lock-step:

    node costs   [P, S, L]   f32   (precomputed in XLA, see dp_jax)
    candidates   [P, M, L]   i32   (cluster ids, -1 padding)
    cost carry      [S, L]   f32   (VMEM-resident across positions)
    backptrs     [P, S, L]   i32   (output, consumed by the backtrace scan)

Per position the kernel rebuilds the [S, S'] switch-cost structure from the
candidate ids (multiset intersection via the static per-state count table),
then does the min-plus contraction with an explicit unrolled loop over the
S source states, keeping only [S', L] vectors live — the tetraploid state
space (336 padded states) never materialises an [S, S', L] cube.

Grid: one program per chain block; positions advance in a fori_loop inside
the kernel, so the cost carry never leaves VMEM (the XLA scan variant in
thread/dp_jax.py round-trips it through HBM every step).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_INF = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dp_kernel(counts_ref, cand_ref, node_ref, cost_ref, bp_ref, *,
               num_positions: int, num_states: int, m_slots: int,
               ploidy: int, switch_cost: float, affine_cost: float):
    """counts_ref: [S, M] static state count table (padded states are
    all-zero rows and are kept unreachable by +inf node costs)."""
    S, M, k = num_states, m_slots, ploidy

    cost0 = node_ref[0]                     # [S, L]
    bp_ref[0] = jnp.zeros((S, LANES), dtype=jnp.int32)

    counts = counts_ref[...]                # [S, M] int32

    def step(j, cost):
        c_prev = cand_ref[j - 1]            # [M, L]
        c_cur = cand_ref[j]                 # [M, L]
        node_j = node_ref[j]                # [S, L]

        # mapped[m][s', :] = sum_q counts[s', q] * [c_prev[m] == c_cur[q]]
        countsf = counts.astype(jnp.float32)
        mapped = []
        for m in range(M):
            acc = jnp.zeros((S, LANES), dtype=jnp.float32)
            prev_m = c_prev[m]              # [L]
            for q in range(M):
                eq = jnp.logical_and(prev_m == c_cur[q], prev_m >= 0)
                acc = acc + countsf[:, q][:, None] \
                    * eq.astype(jnp.float32)[None, :]
            mapped.append(acc)              # [S, L] for slot m
        mapped = jnp.stack(mapped)          # [M, S, L]

        # min-plus contraction over source states, statically blocked so no
        # value-level dynamic_slice reaches Mosaic (unsupported); each block
        # materialises only [SB, S', L] (smaller blocks for big state
        # spaces so the temporaries fit VMEM)
        SB = 16 if S <= 64 else 4
        best = jnp.full((S, LANES), _INF, dtype=jnp.float32)
        best_idx = jnp.zeros((S, LANES), dtype=jnp.int32)
        for s0 in range(0, S, SB):
            sb = min(SB, S - s0)
            counts_blk = countsf[s0:s0 + sb]          # [sb, M] static slice
            inter = jnp.zeros((sb, S, LANES), dtype=jnp.float32)
            for m in range(M):
                inter = inter + jnp.minimum(
                    counts_blk[:, m][:, None, None], mapped[m][None, :, :])
            switches = k - inter
            trans = switch_cost * switches + affine_cost * (switches > 0)
            total = cost[s0:s0 + sb][:, None, :] + trans   # [sb, S', L]
            blk_min = jnp.min(total, axis=0)
            blk_arg = jnp.argmin(total, axis=0).astype(jnp.int32) + s0
            upd = blk_min < best
            best = jnp.where(upd, blk_min, best)
            best_idx = jnp.where(upd, blk_arg, best_idx)
        bp_ref[j] = best_idx
        return best + node_j

    final_cost = jax.lax.fori_loop(1, num_positions, step, cost0)
    cost_ref[...] = final_cost


def minplus_forward(candidates: jax.Array, node_costs: jax.Array,
                    counts_table: jax.Array, *, ploidy: int,
                    switch_cost: float, affine_cost: float
                    ) -> Tuple[jax.Array, jax.Array]:
    """Run the Pallas DP over a chain block batch.

    candidates: [C, P, M] int32 (C a multiple of LANES)
    node_costs: [C, P, S] f32 (+inf for invalid states)
    counts_table: [S, M] int32 state count matrix at full candidate width
    Returns (final_costs [C, S], backptrs [C, P, S]).
    """
    C, P, M = candidates.shape
    S = node_costs.shape[2]
    if C % LANES:
        raise ValueError(f"chain batch {C} not a multiple of {LANES}")
    blocks = C // LANES

    # [C, P, X] -> [blocks, P, X, LANES]
    def to_lanes(x):
        return jnp.transpose(
            x.reshape(blocks, LANES, P, x.shape[2]), (0, 2, 3, 1))

    cand_l = to_lanes(candidates)
    node_l = to_lanes(node_costs)

    kernel = functools.partial(
        _dp_kernel, num_positions=P, num_states=S, m_slots=M,
        ploidy=ploidy, switch_cost=float(switch_cost),
        affine_cost=float(affine_cost))

    cost_out, bp_out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((S, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, M, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, S, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, S, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((blocks, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((blocks, P, S, LANES), jnp.int32),
        ],
    )(counts_table.astype(jnp.int32), cand_l, node_l)

    final_costs = jnp.transpose(cost_out, (0, 2, 1)).reshape(C, S)
    backptrs = jnp.transpose(bp_out, (0, 3, 1, 2)).reshape(C, P, S)
    return final_costs, backptrs
