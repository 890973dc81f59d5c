"""Position-streaming Pallas DP: double-buffered HBM -> VMEM pipeline.

The VMEM-resident kernel (ops/minplus.py) holds all P positions of a lane
block on chip, capping P by the 16 MB VMEM (848 diploid / 24 tetraploid
positions).  This variant keeps node costs, candidates, and backpointers in
HBM and streams fixed-size position blocks through double-buffered VMEM
scratch (the pallas guide's DMA pipeline pattern): while block b computes,
block b+1's inputs are in flight and block b-1's backpointers drain back
to HBM.  The cost carry [S, LANES] lives in VMEM across the whole chain,
so arbitrarily long chains and the tetraploid 330-state space run at a
constant ~3 MB VMEM footprint.

Same cost model and state conventions as dp_jax/minplus; parity-tested.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahsoka_tpu.ops.minplus import LANES, _INF


def _stream_kernel(counts_ref, cand_hbm, node_hbm, cost_ref, bp_hbm, *,
                   num_positions: int, block: int, num_states: int,
                   m_slots: int, ploidy: int, switch_cost: float,
                   affine_cost: float):
    """Grid: one program per chain block.

    cand_hbm: [G, P, M, L] int32 (ANY/HBM)
    node_hbm: [G, P, S, L] f32
    cost_ref: [S, L] f32 VMEM output (final costs for this chain block)
    bp_hbm:  [G, P, S, L] int32 output
    """
    S, M, k, PB = num_states, m_slots, ploidy, block
    SB = 8
    S_pad = ((S + SB - 1) // SB) * SB
    g = pl.program_id(0)
    nblocks = num_positions // PB

    # destination-state block: caps the fold temporaries at
    # [SB, DB, LANES] instead of [SB, S, LANES] so the tetraploid
    # 330-state space stays inside the 16 MB scoped-VMEM budget
    DB = min(128, S_pad)

    def body(node_buf, cand_buf, bp_buf, prev_cand, mapped_buf, cost_buf,
             counts_buf, in_sems, out_sems):
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

        counts = counts_ref[...]
        countsf = counts.astype(jnp.float32)
        # padded copies for ref-sliced access in the fold loop: padded
        # source states carry +inf cost so they never win
        countsp = jnp.pad(countsf, ((0, S_pad - S), (0, 0)))
        counts_buf[...] = countsp

        def process_block(blk, cost):
            slot = blk % 2
            nxt = (blk + 1) % 2

            @pl.when(blk + 1 < nblocks)
            def _():
                for d in in_dma(nxt, blk + 1):
                    d.start()

            for d in in_dma(slot, blk):
                d.wait()
            # the previous round used this slot's bp buffer: ensure its
            # drain finished before overwriting
            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            def step(j, cost):
                node_j = node_buf[slot, j]              # [S, L]
                c_cur = cand_buf[slot, j]               # [M, L]
                jm1 = jnp.maximum(j - 1, 0)
                c_prev_buf = cand_buf[slot, jm1]
                c_prev = jnp.where(j == 0, prev_cand[...], c_prev_buf)
                is_first = jnp.logical_and(blk == 0, j == 0)

                for mm in range(M):
                    acc = jnp.zeros((S_pad, LANES), dtype=jnp.float32)
                    prev_m = c_prev[mm]
                    for q in range(M):
                        eq = jnp.logical_and(prev_m == c_cur[q],
                                             prev_m >= 0)
                        acc = acc + countsp[:, q][:, None] \
                            * eq.astype(jnp.float32)[None, :]
                    mapped_buf[mm] = acc
                cost_buf[...] = jnp.pad(cost, ((0, S_pad - S), (0, 0)),
                                        constant_values=_INF)

                # source-state fold as a fori_loop over ref slices; the
                # destination axis is block-unrolled so every live
                # temporary is [SB, DB, L] regardless of S
                def fold(b, carry):
                    best, best_idx = carry
                    s0 = b * SB
                    counts_blk = counts_buf[pl.ds(s0, SB), :]   # [SB, M]
                    cost_blk = cost_buf[pl.ds(s0, SB), :]       # [SB, L]
                    mins, args = [], []
                    for d0 in range(0, S_pad, DB):
                        db = min(DB, S_pad - d0)
                        inter = jnp.zeros((SB, db, LANES),
                                          dtype=jnp.float32)
                        for mm in range(M):
                            inter = inter + jnp.minimum(
                                counts_blk[:, mm][:, None, None],
                                mapped_buf[mm, pl.ds(d0, db), :][None])
                        switches = k - inter
                        trans = switch_cost * switches \
                            + affine_cost * (switches > 0)
                        total = cost_blk[:, None, :] + trans
                        mins.append(jnp.min(total, axis=0))
                        args.append(jnp.argmin(total, axis=0).astype(
                            jnp.int32) + s0)
                    blk_min = jnp.concatenate(mins, axis=0)[:S]
                    blk_arg = jnp.concatenate(args, axis=0)[:S]
                    upd = blk_min < best
                    return (jnp.where(upd, blk_min, best),
                            jnp.where(upd, blk_arg, best_idx))

                best, best_idx = jax.lax.fori_loop(
                    0, S_pad // SB, fold,
                    (jnp.full((S, LANES), _INF, dtype=jnp.float32),
                     jnp.zeros((S, LANES), dtype=jnp.int32)))

                new_cost = jnp.where(is_first, node_j, best + node_j)
                bp_buf[slot, j] = jnp.where(is_first,
                                            jnp.zeros_like(best_idx),
                                            best_idx)
                return new_cost

            cost = jax.lax.fori_loop(0, PB, step, cost)
            # boundary carry: the block's last candidates feed the next
            # block's first transition
            prev_cand[...] = cand_buf[slot, PB - 1]
            out_dma(slot, blk).start()
            return cost

        init = jnp.zeros((S, LANES), dtype=jnp.float32)
        final_cost = jax.lax.fori_loop(0, nblocks, process_block, init)
        # drain the trailing backpointer blocks
        @pl.when(nblocks >= 2)
        def _():
            out_dma((nblocks - 2) % 2, nblocks - 2).wait()
        out_dma((nblocks - 1) % 2, nblocks - 1).wait()
        cost_ref[...] = final_cost

    pl.run_scoped(
        body,
        node_buf=pltpu.VMEM((2, block, S, LANES), jnp.float32),
        cand_buf=pltpu.VMEM((2, block, M, LANES), jnp.int32),
        bp_buf=pltpu.VMEM((2, block, S, LANES), jnp.int32),
        prev_cand=pltpu.VMEM((M, LANES), jnp.int32),
        mapped_buf=pltpu.VMEM((M, S_pad, LANES), jnp.float32),
        cost_buf=pltpu.VMEM((S_pad, LANES), jnp.float32),
        counts_buf=pltpu.VMEM((S_pad, M), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _stream_kernel_ge(counts_ref, gesel_ref, cand_hbm, node_hbm, cost_ref,
                      bp_hbm, *, num_positions: int, block: int,
                      num_states: int, m_slots: int, ploidy: int,
                      switch_cost: float, affine_cost: float):
    """GE-matmul variant of _stream_kernel: the multiset intersection
    uses min(a, b) = sum_t [a >= t][b >= t] (exact for small non-negative
    integers), which turns the per-position inter build into one MXU
    contraction per source-state block instead of M min+add sweeps:

        inter[s, s', l] = sum_x gesel[s, x] * ge[x, s', l]
        gesel[s, m*k + t-1] = [counts[s, m] >= t]       (static)
        ge[m*k + t-1, s', l] = [mapped[m, s', l] >= t]  (per position)

    mapped itself is an [S, M] @ [M, L] matmul per prev slot.  All
    operands are exact small integers in bf16/f32, so costs and argmin
    tie-breaks stay bit-identical to _stream_kernel and the XLA scan.
    """
    S, M, k, PB = num_states, m_slots, ploidy, block
    X = M * k
    SB = 8
    S_pad = ((S + SB - 1) // SB) * SB
    g = pl.program_id(0)
    nblocks = num_positions // PB
    # destination-state block (see _stream_kernel): fold temporaries are
    # [SB, DB, L]; ge/gesel are exact 0/1 indicators so bf16 storage and
    # f32-accumulated MXU dots stay bit-identical to the f32 path
    DB = min(128, S_pad)

    def body(node_buf, cand_buf, bp_buf, prev_cand, ge_buf, cost_buf,
             gesel_buf, in_sems, out_sems):
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

        countsf = counts_ref[...].astype(jnp.float32)       # [S, M]
        countsp = jnp.pad(countsf, ((0, S_pad - S), (0, 0)))
        gesel_buf[...] = jnp.pad(
            gesel_ref[...],
            ((0, S_pad - S), (0, 0))).astype(jnp.bfloat16)  # [S_pad, X]
        cost_pad = jnp.full((S_pad - S, LANES), _INF, dtype=jnp.float32)

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
                node_j = node_buf[slot, j]              # [S, L]
                c_cur = cand_buf[slot, j]               # [M, L]
                jm1 = jnp.maximum(j - 1, 0)
                c_prev = jnp.where(j == 0, prev_cand[...],
                                   cand_buf[slot, jm1])
                is_first = jnp.logical_and(blk == 0, j == 0)

                # mapped[m] = counts @ eq_m : one [S, M] @ [M, L] matmul
                # per prev slot; thresholds fill the [X, S, L] ge buffer
                for m in range(M):
                    eq_m = jnp.logical_and(
                        c_prev[m][None, :] == c_cur,
                        c_prev[m][None, :] >= 0).astype(jnp.float32)
                    mapped = jax.lax.dot_general(
                        countsp, eq_m, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [S_pad, L]
                    for t in range(1, k + 1):
                        ge_buf[m * k + (t - 1)] = \
                            (mapped >= t).astype(jnp.bfloat16)
                cost_buf[...] = jnp.concatenate([cost, cost_pad])

                def fold(b, carry):
                    best, best_idx = carry
                    s0 = b * SB
                    gesel_blk = gesel_buf[pl.ds(s0, SB), :]     # [SB, X]
                    cost_blk = cost_buf[pl.ds(s0, SB), :]       # [SB, L]
                    mins, args = [], []
                    for d0 in range(0, S_pad, DB):
                        db = min(DB, S_pad - d0)
                        ge_blk = ge_buf[:, pl.ds(d0, db), :]  # [X, db, L]
                        inter = jax.lax.dot_general(
                            gesel_blk, ge_blk, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        switches = k - inter             # [SB, db, L]
                        trans = switch_cost * switches \
                            + affine_cost * (switches > 0)
                        total = cost_blk[:, None, :] + trans
                        mins.append(jnp.min(total, axis=0))
                        args.append(jnp.argmin(total, axis=0).astype(
                            jnp.int32) + s0)
                    blk_min = jnp.concatenate(mins, axis=0)[:S]
                    blk_arg = jnp.concatenate(args, axis=0)[:S]
                    upd = blk_min < best
                    return (jnp.where(upd, blk_min, best),
                            jnp.where(upd, blk_arg, best_idx))

                best, best_idx = jax.lax.fori_loop(
                    0, S_pad // SB, fold,
                    (jnp.full((S, LANES), _INF, dtype=jnp.float32),
                     jnp.zeros((S, LANES), dtype=jnp.int32)))

                new_cost = jnp.where(is_first, node_j, best + node_j)
                bp_buf[slot, j] = jnp.where(is_first,
                                            jnp.zeros_like(best_idx),
                                            best_idx)
                return new_cost

            cost = jax.lax.fori_loop(0, PB, step, cost)
            prev_cand[...] = cand_buf[slot, PB - 1]
            out_dma(slot, blk).start()
            return cost

        init = jnp.zeros((S, LANES), dtype=jnp.float32)
        final_cost = jax.lax.fori_loop(0, nblocks, process_block, init)

        @pl.when(nblocks >= 2)
        def _():
            out_dma((nblocks - 2) % 2, nblocks - 2).wait()
        out_dma((nblocks - 1) % 2, nblocks - 1).wait()
        cost_ref[...] = final_cost

    pl.run_scoped(
        body,
        node_buf=pltpu.VMEM((2, block, S, LANES), jnp.float32),
        cand_buf=pltpu.VMEM((2, block, M, LANES), jnp.int32),
        bp_buf=pltpu.VMEM((2, block, S, LANES), jnp.int32),
        prev_cand=pltpu.VMEM((M, LANES), jnp.int32),
        ge_buf=pltpu.VMEM((M * k, S_pad, LANES), jnp.bfloat16),
        cost_buf=pltpu.VMEM((S_pad, LANES), jnp.float32),
        gesel_buf=pltpu.VMEM((S_pad, M * k), jnp.bfloat16),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def ge_selector(counts_table: jax.Array, ploidy: int) -> jax.Array:
    """[S, M*k] 0/1 selector: gesel[s, m*k + t-1] = counts[s, m] >= t.
    Traceable (counts_table may be a jit argument)."""
    counts = counts_table.astype(jnp.int32)            # [S, M]
    t = jnp.arange(1, ploidy + 1)
    sel = (counts[:, :, None] >= t[None, None, :]).astype(jnp.float32)
    return sel.reshape(counts.shape[0], counts.shape[1] * ploidy)


def _pick_block(S: int, M: int, positions: int) -> int:
    """Block size so the double-buffered scratch stays well under VMEM
    (large state spaces need headroom for the fold temporaries)."""
    budget = (6 if S <= 64 else 2) * 1024 * 1024
    per_pos = 2 * (S * LANES * 8 + M * LANES * 4)
    pb = max(budget // per_pos, 8)
    pb = min(pb, positions, 256)
    return max(pb // 8 * 8, 8)


def minplus_forward_streamed(candidates: jax.Array, node_costs: jax.Array,
                             counts_table: jax.Array, *, ploidy: int,
                             switch_cost: float, affine_cost: float,
                             ge: bool = True
                             ) -> Tuple[jax.Array, jax.Array]:
    """Streaming variant of ops.minplus.minplus_forward; same interface.

    candidates: [C, P, M] int32 (C multiple of LANES; P padded to the
    chosen position block internally).  ``ge`` selects the GE-matmul
    inter build (_stream_kernel_ge, default); results are bit-identical
    either way."""
    C, P, M = candidates.shape
    S = node_costs.shape[2]
    if C % LANES:
        raise ValueError(f"chain batch {C} not a multiple of {LANES}")
    blocks = C // LANES
    PB = _pick_block(S, M, P)
    P_pad = ((P + PB - 1) // PB) * PB
    if P_pad != P:
        pad = P_pad - P
        candidates = jnp.pad(candidates, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1)
        # padded positions: constant-cost transitions, single valid state 0
        node_pad = jnp.full((C, pad, S), _INF, dtype=node_costs.dtype)
        node_pad = node_pad.at[:, :, 0].set(0.0)
        node_costs = jnp.concatenate([node_costs, node_pad], axis=1)

    def to_lanes(x):
        return jnp.transpose(
            x.reshape(blocks, LANES, P_pad, x.shape[2]), (0, 2, 3, 1))

    cand_l = to_lanes(candidates)
    node_l = to_lanes(node_costs)

    kern_fn = _stream_kernel_ge if ge else _stream_kernel
    kernel = functools.partial(
        kern_fn, num_positions=P_pad, block=PB, num_states=S,
        m_slots=M, ploidy=ploidy, switch_cost=float(switch_cost),
        affine_cost=float(affine_cost))

    table_specs = [pl.BlockSpec((S, M), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
    tables = [counts_table.astype(jnp.int32)]
    if ge:
        X = M * ploidy
        table_specs.append(pl.BlockSpec((S, X), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        tables.append(ge_selector(counts_table, ploidy))

    cost_out, bp_out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=table_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((None, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((blocks, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((blocks, P_pad, S, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*tables, cand_l, node_l)

    final_costs = jnp.transpose(cost_out, (0, 2, 1)).reshape(C, S)
    backptrs = jnp.transpose(bp_out, (0, 3, 1, 2)).reshape(C, P_pad, S)
    # NB: final_costs/backptrs cover the padded positions; backtrace over
    # the full P_pad and slice the first P states (the pad transitions add
    # a constant to every path, and the pad backpointers recover the true
    # best state at position P-1)
    return final_costs, backptrs
