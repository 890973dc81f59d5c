"""Batched threading DP via the Pallas min-plus kernel.

Pipeline: XLA computes batched node costs (thread/dp_jax.node_costs_all,
vmapped), the Pallas kernel (ops/minplus.py) runs the forward min-plus scan
for 128 chains per lane block with the cost carry resident in VMEM, and a
vmapped XLA scan backtraces.  Interface matches dist/step.batched_dp_forward
but returns the full state sequences.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ahsoka_tpu.ops.minplus import LANES, minplus_forward
from ahsoka_tpu.thread.dp_jax import node_costs_all


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("ploidy", "num_alleles", "switch_cost", "affine_cost",
                     "cov_w", "geno_w"))
def thread_batch_pallas(candidates, num_candidates, coverage, consensus,
                        genotypes, counts_table, valid_table, *,
                        ploidy: int, num_alleles: int,
                        switch_cost: float, affine_cost: float,
                        cov_w: float = 1.0, geno_w: float = 1.0
                        ) -> Tuple[jax.Array, jax.Array]:
    """[C, P, ...] batched inputs -> (states [C, P], final_costs [C, S]).

    C must be a multiple of 128 (pad with dummy chains).
    """
    C, P, M = candidates.shape

    node_fn = functools.partial(
        node_costs_all, ploidy=ploidy, num_alleles=num_alleles,
        cov_w=cov_w, geno_w=geno_w)
    node, _ = jax.vmap(
        lambda ca, nc, co, cs, ge: node_fn(ca, nc, co, cs, ge,
                                           counts_table, valid_table)
    )(candidates, num_candidates, coverage, consensus, genotypes)

    final_costs, backptrs = minplus_forward(
        candidates, node, counts_table, ploidy=ploidy,
        switch_cost=switch_cost, affine_cost=affine_cost)

    final_state = jnp.argmin(final_costs, axis=1).astype(jnp.int32)

    def backtrace(final, bps):
        # bps: [P, S]; bps[j] maps the state at position j to its best
        # predecessor at j-1 (bps[0] is unused zeros)
        def step(state, bp):
            return bp[state], state
        state0, tail = jax.lax.scan(step, final, bps[1:], reverse=True)
        return jnp.concatenate([state0[None], tail])

    states = jax.vmap(backtrace)(final_state, backptrs)   # [C, P]
    return states, final_costs


def _pad_chains_traced(candidates, node, multiple: int):
    """Pad the chain axis to a kernel multiple INSIDE the jitted program:
    the host uploads only real chains (a single 10k-position chain padded
    to the diploid superblock's 1024-chain multiple on host shipped
    ~500 MB of sentinel arrays through the remote tunnel).  Only the two
    kernel inputs need padding — sentinel chains get candidates=-1 and
    zero node costs; their states are sliced away before the fetch."""
    C = candidates.shape[0]
    C_pad = _round_up(max(C, multiple), multiple)
    if C_pad == C:
        return candidates, node
    pad = C_pad - C
    candidates = jnp.pad(candidates, ((0, pad), (0, 0), (0, 0)),
                         constant_values=-1)
    node = jnp.pad(node, ((0, pad), (0, 0), (0, 0)))
    return candidates, node


@functools.partial(
    jax.jit,
    static_argnames=("ploidy", "num_alleles", "switch_cost", "affine_cost",
                     "cov_w", "geno_w", "pad_to"))
def thread_batch_pallas_streamed(candidates, num_candidates, coverage,
                                 consensus, genotypes, counts_table,
                                 valid_table, *, ploidy: int,
                                 num_alleles: int, switch_cost: float,
                                 affine_cost: float, cov_w: float = 1.0,
                                 geno_w: float = 1.0, pad_to: int = 0
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Streaming-kernel variant of thread_batch_pallas: no position limit
    (double-buffered HBM pipeline, ops/minplus_stream.py).

    ``pad_to > 0``: inputs arrive at their real chain count; node costs
    are computed on real chains only, the chain axis is padded to the
    kernel multiple on device, and the states are sliced back before
    leaving the program.  ``pad_to == 0`` assumes pre-padded inputs
    (legacy callers/tests)."""
    from ahsoka_tpu.ops.minplus_stream import minplus_forward_streamed

    C, P, M = candidates.shape

    node_fn = functools.partial(
        node_costs_all, ploidy=ploidy, num_alleles=num_alleles,
        cov_w=cov_w, geno_w=geno_w)
    node, _ = jax.vmap(
        lambda ca, nc, co, cs, ge: node_fn(ca, nc, co, cs, ge,
                                           counts_table, valid_table)
    )(candidates, num_candidates, coverage, consensus, genotypes)

    kc, kn = (_pad_chains_traced(candidates, node, pad_to) if pad_to
              else (candidates, node))
    final_costs, backptrs = minplus_forward_streamed(
        kc, kn, counts_table, ploidy=ploidy,
        switch_cost=switch_cost, affine_cost=affine_cost)
    final_costs, backptrs = final_costs[:C], backptrs[:C]

    final_state = jnp.argmin(final_costs, axis=1).astype(jnp.int32)

    def backtrace(final, bps):
        def step(state, bp):
            return bp[state], state
        state0, tail = jax.lax.scan(step, final, bps[1:], reverse=True)
        return jnp.concatenate([state0[None], tail])

    states = jax.vmap(backtrace)(final_state, backptrs)
    return states[:, :P], final_costs


@functools.partial(
    jax.jit,
    static_argnames=("ploidy", "num_alleles", "switch_cost", "affine_cost",
                     "cov_w", "geno_w", "pad_to"))
def thread_batch_pallas_diploid(candidates, num_candidates, coverage,
                                consensus, genotypes, counts_table,
                                valid_table, *, ploidy: int,
                                num_alleles: int, switch_cost: float,
                                affine_cost: float, cov_w: float = 1.0,
                                geno_w: float = 1.0, pad_to: int = 0
                                ) -> Tuple[jax.Array, jax.Array]:
    """Diploid-specialised kernels (ops/minplus_diploid.py): 1024 chains
    per block on full [8, 128] vregs, 10-state space unrolled; forward
    and backtrace both run as streaming Pallas kernels.  With
    ``pad_to == 0`` C must be a multiple of 1024
    (pad_chain_batch(..., multiple=1024)); ``pad_to = 1024`` pads the
    chain axis on device instead (see thread_batch_pallas_streamed)."""
    from ahsoka_tpu.ops.minplus_diploid import (SUPER, backtrace_diploid,
                                                minplus_forward_diploid_raw)

    if ploidy != 2:
        raise ValueError("thread_batch_pallas_diploid requires ploidy=2")
    C, P, M = candidates.shape

    node_fn = functools.partial(
        node_costs_all, ploidy=ploidy, num_alleles=num_alleles,
        cov_w=cov_w, geno_w=geno_w)
    node, _ = jax.vmap(
        lambda ca, nc, co, cs, ge: node_fn(ca, nc, co, cs, ge,
                                           counts_table, valid_table)
    )(candidates, num_candidates, coverage, consensus, genotypes)

    kc, kn = (_pad_chains_traced(candidates, node, pad_to) if pad_to
              else (candidates, node))
    final_costs, bp_raw = minplus_forward_diploid_raw(
        kc, kn, switch_cost=switch_cost, affine_cost=affine_cost)
    final_costs = final_costs[:C]

    final_state = jnp.argmin(final_costs, axis=1).astype(jnp.int32)
    if pad_to:
        # the backtrace kernel walks superblocks of 1024 chains; feed it
        # the padded final-state vector and slice its states output
        C_pad = bp_raw.shape[0] * SUPER
        states = backtrace_diploid(
            bp_raw, jnp.pad(final_state, (0, C_pad - C)))[:C]
    else:
        states = backtrace_diploid(bp_raw, final_state)
    return states[:, :P], final_costs


def max_pallas_positions(ploidy: int) -> int:
    """Largest position count whose lane block fits VMEM (~16 MB): node
    costs f32 [P, S, 128] + backptrs i32 [P, S, 128] + candidates.
    Beyond this the XLA scan path takes over (a position-streaming kernel
    with double-buffered DMA is the planned extension)."""
    from ahsoka_tpu.thread.states import max_states

    S = max_states(ploidy)
    budget = 10 * 1024 * 1024
    per_pos = S * LANES * 8 + 2 * ploidy * LANES * 4
    return max((budget // per_pos) // 8 * 8, 8)


def pad_chain_batch(cands, ncand, cov, cons, geno, multiple: int = LANES):
    """Pad the chain axis to a multiple of `multiple` (default one lane
    block; the diploid superblock kernel needs 1024) with sentinel
    chains."""
    C = cands.shape[0]
    C_pad = _round_up(max(C, multiple), multiple)
    pad = C_pad - C
    if pad == 0:
        return cands, ncand, cov, cons, geno, C
    pad_spec = lambda x, cv: np.pad(
        x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=cv)
    return (pad_spec(cands, -1), pad_spec(ncand, 1), pad_spec(cov, 0),
            pad_spec(cons, 0), pad_spec(geno, 0), C)
