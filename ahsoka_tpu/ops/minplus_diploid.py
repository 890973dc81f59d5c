"""Diploid-specialised Pallas DP: 1024 chains per block, unrolled states.

The general kernels (ops/minplus.py, ops/minplus_stream.py) lay chains on
the 128-lane axis and keep states on sublanes — right for the tetraploid
330-state space, but wasteful for diploid where S=10 pads to 16 sublanes
and every [S, L] op runs at 62% occupancy.  This kernel instead packs
**1024 chains per vreg** ([8 sublanes x 128 lanes], chains on both axes)
and unrolls the 10-state diploid space into registers, so every VPU op is
fully dense.

Transition costs use an exact boolean decomposition instead of the
mapped/min multiset intersection: with distinct candidates per position
(guaranteed — candidates are sorted unique cluster ids; -1 padding never
matches), for source state s={u,v} and target s'={a,b}

    inter(s, s')   = ge1[u,s'] + ge1[v,s']        (u != v)
                   = ge1[u,s'] + ge2[u,s']        (u == v)
    ge1[m,{a,b}]   = eq[m,a] | eq[m,b]   (a != b),  eq[m,a]  (a == b)
    ge2[m,{a,a}]   = eq[m,a],            0 otherwise
    trans          = switch*(k - inter) + affine*(inter < k)
                   = (2*switch + affine) - switch*su - affine*pr

with su = inter and pr = [inter == 2] (= ge1[u]*ge1[v] resp. ge2[u]).
All terms are exact small-integer floats, so the computed trans — and
therefore every cost and argmin tie-break — is bit-identical to the XLA
scan (thread/dp_jax.dp_forward_core) and the general Pallas kernels.

Reference semantics: WhatsHap HaploThreader::computePaths call site,
/root/reference src/alignmentstoreadset.cpp:319-409 (switch 32.0, affine
8.0, diploid driver src/alignmentstoreadset.cpp:306).

Positions stream through double-buffered VMEM blocks (same HBM pipeline
as ops/minplus_stream.py), so chain length is unbounded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahsoka_tpu.ops.minplus import _INF
from ahsoka_tpu.thread.states import state_tuples

SUBLANES = 8
LANES = 128
SUPER = SUBLANES * LANES          # chains per grid block
_M = 4                            # 2 * ploidy candidate slots
_S = 10                           # C(4+2-1, 2) diploid states


def _dp2_kernel(cand_hbm, node_hbm, cost_ref, bp_hbm, *,
                num_positions: int, block: int, switch_cost: float,
                affine_cost: float):
    """Grid: one program per 1024-chain superblock.

    cand_hbm: [G, P, M, 8, 128] int32 (ANY/HBM)
    node_hbm: [G, P, S, 8, 128] f32
    cost_ref: [S, 8, 128] f32 VMEM output (final costs)
    bp_hbm:   [G, P, S, 8, 128] int32 output
    """
    M, S, PB = _M, _S, block
    tuples = state_tuples(M, 2)                     # static 10 multisets
    g = pl.program_id(0)
    nblocks = num_positions // PB
    c_full = 2.0 * switch_cost + affine_cost        # 72 at reference costs

    def body(node_buf, cand_buf, bp_buf, prev_cand, in_sems, out_sems):
        def in_dma(slot, blk):
            return (
                pltpu.make_async_copy(
                    node_hbm.at[g, pl.ds(blk * PB, PB)],
                    node_buf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    cand_hbm.at[g, pl.ds(blk * PB, PB)],
                    cand_buf.at[slot], in_sems.at[slot, 1]),
            )

        def out_dma(slot, blk):
            return pltpu.make_async_copy(
                bp_buf.at[slot], bp_hbm.at[g, pl.ds(blk * PB, PB)],
                out_sems.at[slot])

        for d in in_dma(0, 0):
            d.start()

        def process_block(blk, cost):
            slot = blk % 2
            nxt = (blk + 1) % 2

            @pl.when(blk + 1 < nblocks)
            def _():
                for d in in_dma(nxt, blk + 1):
                    d.start()

            for d in in_dma(slot, blk):
                d.wait()

            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            def step(j, cost):
                node_j = node_buf[slot, j]          # [S, 8, 128]
                c_cur = cand_buf[slot, j]           # [M, 8, 128]
                jm1 = jnp.maximum(j - 1, 0)
                c_prev = jnp.where(j == 0, prev_cand[...],
                                   cand_buf[slot, jm1])
                is_first = jnp.logical_and(blk == 0, j == 0)

                # eq[m][q]: prev slot m carries the same cluster as cur
                # slot q (exclusive over q: candidates are distinct)
                eqf = [[jnp.logical_and(c_prev[m] == c_cur[q],
                                        c_prev[m] >= 0
                                        ).astype(jnp.float32)
                        for q in range(M)] for m in range(M)]

                # ge1[m][s']: slot m's cluster survives into s' (>=1 copy)
                ge1 = {}
                for m in range(M):
                    for (a, b) in tuples:
                        ge1[(m, a, b)] = (eqf[m][a] if a == b
                                          else eqf[m][a] + eqf[m][b])

                best = [None] * S
                besti = [None] * S
                for si, (u, v) in enumerate(tuples):
                    cost_s = cost[si]               # [8, 128]
                    for ci, (a, b) in enumerate(tuples):
                        g1u = ge1[(u, a, b)]
                        if u != v:
                            g1v = ge1[(v, a, b)]
                            su = g1u + g1v
                            pr = g1u * g1v
                            tr = (c_full - switch_cost * su
                                  - affine_cost * pr)
                        elif a == b:
                            # su = 2*eq, pr = eq -> trans = c_full*(1-eq)
                            tr = c_full - c_full * g1u
                        else:
                            # ge2 = 0: su = g1u (<= 1), pr = 0
                            tr = c_full - switch_cost * g1u
                        total = cost_s + tr
                        if best[ci] is None:
                            best[ci] = total
                            besti[ci] = jnp.zeros_like(c_cur[0])
                        else:
                            upd = total < best[ci]
                            best[ci] = jnp.where(upd, total, best[ci])
                            besti[ci] = jnp.where(upd, si, besti[ci])

                best_v = jnp.stack(best)            # [S, 8, 128]
                best_i = jnp.stack(besti)
                new_cost = jnp.where(is_first, node_j, best_v + node_j)
                bp_buf[slot, j] = jnp.where(is_first,
                                            jnp.zeros_like(best_i), best_i)
                return new_cost

            cost = jax.lax.fori_loop(0, PB, step, cost)
            prev_cand[...] = cand_buf[slot, PB - 1]
            out_dma(slot, blk).start()
            return cost

        init = jnp.zeros((S, SUBLANES, LANES), dtype=jnp.float32)
        final_cost = jax.lax.fori_loop(0, nblocks, process_block, init)

        @pl.when(nblocks >= 2)
        def _():
            out_dma((nblocks - 2) % 2, nblocks - 2).wait()
        out_dma((nblocks - 1) % 2, nblocks - 1).wait()
        cost_ref[...] = final_cost

    pl.run_scoped(
        body,
        node_buf=pltpu.VMEM((2, block, _S, SUBLANES, LANES), jnp.float32),
        cand_buf=pltpu.VMEM((2, block, _M, SUBLANES, LANES), jnp.int32),
        bp_buf=pltpu.VMEM((2, block, _S, SUBLANES, LANES), jnp.int32),
        prev_cand=pltpu.VMEM((_M, SUBLANES, LANES), jnp.int32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _bt2_kernel(bp_hbm, final_ref, states_hbm, *, num_positions: int,
                block: int):
    """Reverse-streaming backtrace: states[P-1] = final;
    states[j-1] = bp[j][states[j]].

    bp_hbm:    [G, P, S, 8, 128] int32 (ANY/HBM)
    final_ref: [8, 128] int32 VMEM (best final state per chain)
    states_hbm:[G, P, 8, 128] int32 output
    The XLA equivalent (vmapped gather scan) costs milliseconds for 1024
    positions; here each position is S compare+selects on full vregs.
    """
    S, PB = _S, block
    g = pl.program_id(0)
    nblocks = num_positions // PB

    def body(bp_buf, st_buf, in_sems, out_sems):
        def in_dma(slot, blk):
            return pltpu.make_async_copy(
                bp_hbm.at[g, pl.ds(blk * PB, PB)], bp_buf.at[slot],
                in_sems.at[slot])

        def out_dma(slot, blk):
            return pltpu.make_async_copy(
                st_buf.at[slot], states_hbm.at[g, pl.ds(blk * PB, PB)],
                out_sems.at[slot])

        in_dma(0, nblocks - 1).start()

        def process_block(i, carry):
            blk = nblocks - 1 - i
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(blk - 1 >= 0)
            def _():
                in_dma(nxt, blk - 1).start()

            in_dma(slot, blk).wait()

            @pl.when(i >= 2)
            def _():
                out_dma(slot, nblocks - 1 - (i - 2)).wait()

            def step(jj, carry):
                j = PB - 1 - jj                 # within-block reverse
                st_buf[slot, j] = carry
                bp_j = bp_buf[slot, j]          # [S, 8, 128]
                prev = bp_j[0]
                for s in range(1, S):
                    prev = jnp.where(carry == s, bp_j[s], prev)
                # position 0's bp is unused zeros; guard via index math:
                # at global j == 0 the emitted carry is final anyway
                return prev

            carry = jax.lax.fori_loop(0, PB, step, carry)
            out_dma(slot, blk).start()
            return carry

        final = final_ref[...]
        jax.lax.fori_loop(0, nblocks, process_block, final)

        @pl.when(nblocks >= 2)
        def _():
            out_dma(nblocks % 2, nblocks - 1 - (nblocks - 2)).wait()
        out_dma((nblocks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        bp_buf=pltpu.VMEM((2, block, _S, SUBLANES, LANES), jnp.int32),
        st_buf=pltpu.VMEM((2, block, SUBLANES, LANES), jnp.int32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def backtrace_diploid(backptrs_raw: jax.Array, final_state: jax.Array
                      ) -> jax.Array:
    """states [C, P] from raw-layout backpointers.

    backptrs_raw: [G, P, S, 8, 128] int32 (minplus_forward_diploid_raw)
    final_state:  [C] int32 (argmin of final costs)
    """
    G, P, S = backptrs_raw.shape[:3]
    C = G * SUPER
    final_l = final_state.reshape(G, SUBLANES, LANES)

    kernel = functools.partial(_bt2_kernel, num_positions=P,
                               block=_pick_block(P))
    states = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((None, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, P, SUBLANES, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(backptrs_raw, final_l)
    return jnp.transpose(states, (0, 2, 3, 1)).reshape(C, P)


def _pick_block(positions: int) -> int:
    """Position block: double-buffered scratch ~6 MB at PB=32."""
    pb = min(32, positions)
    return max(pb // 8 * 8, 8)


def minplus_forward_diploid_raw(candidates: jax.Array,
                                node_costs: jax.Array, *,
                                switch_cost: float, affine_cost: float
                                ) -> Tuple[jax.Array, jax.Array]:
    """As minplus_forward_diploid but returns backpointers in the raw
    superblock layout [G, P_pad, S, 8, 128] for backtrace_diploid
    (avoids two full-size transposes)."""
    C, P, M = candidates.shape
    if M != _M:
        raise ValueError(f"diploid kernel needs M=4 slots, got {M}")
    if node_costs.shape[2] != _S:
        raise ValueError(f"diploid kernel needs S=10 states, got "
                         f"{node_costs.shape[2]}")
    if C % SUPER:
        raise ValueError(f"chain batch {C} not a multiple of {SUPER}")
    blocks = C // SUPER
    PB = _pick_block(P)
    P_pad = ((P + PB - 1) // PB) * PB
    if P_pad != P:
        pad = P_pad - P
        candidates = jnp.pad(candidates, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1)
        node_pad = jnp.full((C, pad, _S), _INF, dtype=node_costs.dtype)
        node_pad = node_pad.at[:, :, 0].set(0.0)
        node_costs = jnp.concatenate([node_costs, node_pad], axis=1)

    # [C, P, X] -> [G, P, X, 8, 128] with chain c = g*1024 + sub*128 + lane
    def to_super(x):
        X = x.shape[2]
        return jnp.transpose(
            x.reshape(blocks, SUBLANES, LANES, P_pad, X), (0, 3, 4, 1, 2))

    cand_l = to_super(candidates)
    node_l = to_super(node_costs)

    kernel = functools.partial(
        _dp2_kernel, num_positions=P_pad, block=PB,
        switch_cost=float(switch_cost), affine_cost=float(affine_cost))

    cost_out, bp_out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((None, _S, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((blocks, _S, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((blocks, P_pad, _S, SUBLANES, LANES),
                                 jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cand_l, node_l)

    # [G, S, 8, 128] -> [C, S]
    final_costs = jnp.transpose(cost_out, (0, 2, 3, 1)).reshape(C, _S)
    return final_costs, bp_out


def minplus_forward_diploid(candidates: jax.Array, node_costs: jax.Array,
                            *, switch_cost: float, affine_cost: float
                            ) -> Tuple[jax.Array, jax.Array]:
    """Diploid streaming DP over a chain batch; same contract as
    ops.minplus.minplus_forward (C must be a multiple of 1024 here).

    candidates: [C, P, 4] int32 (distinct non-negative ids + -1 padding)
    node_costs: [C, P, 10] f32 (+inf for invalid states)
    Returns (final_costs [C, S], backptrs [C, P_pad, S]).
    """
    C = candidates.shape[0]
    final_costs, bp_out = minplus_forward_diploid_raw(
        candidates, node_costs, switch_cost=switch_cost,
        affine_cost=affine_cost)
    P_pad = bp_out.shape[1]
    backptrs = jnp.transpose(bp_out, (0, 3, 4, 1, 2)).reshape(C, P_pad, _S)
    return final_costs, backptrs
