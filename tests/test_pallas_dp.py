"""Pallas min-plus DP kernel vs the XLA scan and host oracle.

Runs in Pallas interpret mode on CPU.  On a real TPU backend these tests
skip: interpret mode emulates the kernel op by op, which on a
remote-tunnel TPU costs one round trip per step (hours per test); the
REAL compiled kernels' hardware parity is checked by
scripts/tpu_parity_check.py and bench.py instead."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode emulation is a CPU test; real-kernel hardware "
           "parity runs via scripts/tpu_parity_check.py")

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread.dp_host import thread_chain
from ahsoka_tpu.thread.states import (full_state_counts,
                                      full_state_validity, state_tuples)

from test_dp import random_dp_inputs


def _tables(ploidy):
    return full_state_counts(ploidy), full_state_validity(ploidy)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("ploidy", [2])
def test_pallas_dp_matches_oracle(seed, ploidy):
    from ahsoka_tpu.thread.dp_pallas import (pad_chain_batch,
                                             thread_batch_pallas)

    cfg = PhasingConfig(ploidy=ploidy)
    dps = [random_dp_inputs(P=8, ploidy=ploidy, num_clusters=5,
                            seed=seed * 10 + i) for i in range(3)]
    counts_table, valid_table = _tables(ploidy)

    cands = np.stack([d.candidates for d in dps])
    ncand = np.stack([d.num_candidates for d in dps])
    cov = np.stack([d.coverage for d in dps])
    cons = np.stack([d.consensus for d in dps])
    geno = np.stack([d.genotypes for d in dps]).astype(np.float32)
    cands, ncand, cov, cons, geno, C = pad_chain_batch(
        cands, ncand, cov, cons, geno)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        states, final_costs = thread_batch_pallas(
            cands, ncand, cov, cons, geno, counts_table, valid_table,
            ploidy=ploidy, num_alleles=geno.shape[2],
            switch_cost=cfg.switch_cost,
            affine_cost=cfg.affine_switch_cost)
    states = np.asarray(states)

    for i, dp in enumerate(dps):
        host = thread_chain(dp, cfg)
        tuples = state_tuples(2 * ploidy, ploidy)
        got = []
        for j in range(dp.num_positions):
            slots = tuples[int(states[i, j])]
            got.append(tuple(int(dp.candidates[j, s]) for s in slots))
        assert [sorted(t) for t in got] == [sorted(t) for t in host], \
            f"chain {i}"


@pytest.mark.parametrize("ploidy,P", [(2, 24), (4, 10)])
def test_streaming_kernel_matches_oracle(ploidy, P):
    """Double-buffered HBM-streaming DP == host oracle (interpret mode),
    including positions that force multiple stream blocks and the
    tetraploid 330-state space."""
    from jax.experimental.pallas import tpu as pltpu
    from ahsoka_tpu.thread.dp_pallas import (pad_chain_batch,
                                             thread_batch_pallas_streamed)

    cfg = PhasingConfig(ploidy=ploidy)
    dps = [random_dp_inputs(P=P, ploidy=ploidy,
                            num_clusters=2 * ploidy + 1, seed=i)
           for i in range(2)]
    counts_table, valid_table = _tables(ploidy)
    cands = np.stack([d.candidates for d in dps])
    ncand = np.stack([d.num_candidates for d in dps])
    cov = np.stack([d.coverage for d in dps])
    cons = np.stack([d.consensus for d in dps])
    geno = np.stack([d.genotypes for d in dps]).astype(np.float32)
    cands, ncand, cov, cons, geno, C = pad_chain_batch(
        cands, ncand, cov, cons, geno)

    import ahsoka_tpu.ops.minplus_stream as ms
    orig = ms._pick_block
    ms._pick_block = lambda S, M, positions: 8   # force multiple blocks
    try:
        with pltpu.force_tpu_interpret_mode():
            states, _ = thread_batch_pallas_streamed(
                cands, ncand, cov, cons, geno, counts_table, valid_table,
                ploidy=ploidy, num_alleles=geno.shape[2],
                switch_cost=cfg.switch_cost,
                affine_cost=cfg.affine_switch_cost)
    finally:
        ms._pick_block = orig
    states = np.asarray(states)

    tuples = state_tuples(2 * ploidy, ploidy)
    for i, dp in enumerate(dps):
        host = thread_chain(dp, cfg)
        got = []
        for j in range(dp.num_positions):
            slots = tuples[int(states[i, j])]
            got.append(tuple(int(dp.candidates[j, s]) for s in slots))
        assert [sorted(t) for t in got] == [sorted(t) for t in host], \
            f"chain {i}"


@pytest.mark.parametrize("P", [8, 24])
def test_diploid_superblock_kernel_matches_oracle(P):
    """Diploid 1024-chain superblock kernel (ops/minplus_diploid.py) ==
    host oracle, bit-identical costs and argmin tie-breaks vs the XLA
    scan, across stream-block boundaries."""
    from jax.experimental.pallas import tpu as pltpu
    from ahsoka_tpu.thread.dp_pallas import (pad_chain_batch,
                                             thread_batch_pallas_diploid)

    cfg = PhasingConfig(ploidy=2)
    dps = [random_dp_inputs(P=P, ploidy=2, num_clusters=5, seed=100 + i)
           for i in range(3)]
    counts_table, valid_table = _tables(2)
    cands = np.stack([d.candidates for d in dps])
    ncand = np.stack([d.num_candidates for d in dps])
    cov = np.stack([d.coverage for d in dps])
    cons = np.stack([d.consensus for d in dps])
    geno = np.stack([d.genotypes for d in dps]).astype(np.float32)
    cands, ncand, cov, cons, geno, C = pad_chain_batch(
        cands, ncand, cov, cons, geno, multiple=1024)

    import ahsoka_tpu.ops.minplus_diploid as md
    orig = md._pick_block
    md._pick_block = lambda positions: 8        # force multiple blocks
    try:
        with pltpu.force_tpu_interpret_mode():
            states, final_costs = thread_batch_pallas_diploid(
                cands, ncand, cov, cons, geno, counts_table, valid_table,
                ploidy=2, num_alleles=geno.shape[2],
                switch_cost=cfg.switch_cost,
                affine_cost=cfg.affine_switch_cost)
    finally:
        md._pick_block = orig
    states = np.asarray(states)

    # exact state-sequence (not just multiset) parity with the XLA scan:
    # same costs, same argmin tie-breaks
    from ahsoka_tpu.dist.step import batched_dp_forward
    import jax
    import jax.numpy as jnp
    fs, bp = jax.jit(lambda *a: batched_dp_forward(
        *a, ploidy=2, num_alleles=geno.shape[2],
        switch_cost=cfg.switch_cost, affine_cost=cfg.affine_switch_cost,
        cov_w=1.0, geno_w=1.0))(
        jnp.asarray(cands), jnp.asarray(ncand), jnp.asarray(cov),
        jnp.asarray(cons), jnp.asarray(geno), jnp.asarray(counts_table),
        jnp.asarray(valid_table))
    from ahsoka_tpu.thread.dp_jax import _backtrace
    s0, tail = jax.jit(jax.vmap(_backtrace))(fs, bp)
    xla_states = np.concatenate(
        [np.asarray(s0)[:, None], np.asarray(tail)], axis=1)
    assert np.array_equal(states[:len(dps)], xla_states[:len(dps)])

    tuples = state_tuples(4, 2)
    for i, dp in enumerate(dps):
        host = thread_chain(dp, cfg)
        got = []
        for j in range(dp.num_positions):
            slots = tuples[int(states[i, j])]
            got.append(tuple(int(dp.candidates[j, s]) for s in slots))
        assert [sorted(t) for t in got] == [sorted(t) for t in host], \
            f"chain {i}"


@pytest.mark.parametrize("kernel", ["streamed", "diploid"])
def test_device_side_padding_matches_prepadded(kernel):
    """pad_to (device-side chain padding + state slicing — the round-5
    fix for config2's host-padded 1024x upload) is bit-identical to the
    legacy host pad_chain_batch path for the real chains."""
    from jax.experimental.pallas import tpu as pltpu
    from ahsoka_tpu.thread.dp_pallas import (pad_chain_batch,
                                             thread_batch_pallas_diploid,
                                             thread_batch_pallas_streamed)

    cfg = PhasingConfig(ploidy=2)
    dps = [random_dp_inputs(P=12, ploidy=2, num_clusters=5, seed=200 + i)
           for i in range(3)]
    counts_table, valid_table = _tables(2)
    cands = np.stack([d.candidates for d in dps])
    ncand = np.stack([d.num_candidates for d in dps])
    cov = np.stack([d.coverage for d in dps])
    cons = np.stack([d.consensus for d in dps])
    geno = np.stack([d.genotypes for d in dps]).astype(np.float32)

    fn = (thread_batch_pallas_diploid if kernel == "diploid"
          else thread_batch_pallas_streamed)
    multiple = 1024 if kernel == "diploid" else 128
    kw = dict(ploidy=2, num_alleles=geno.shape[2],
              switch_cost=cfg.switch_cost,
              affine_cost=cfg.affine_switch_cost)
    pca, pnc, pco, pcs, pge, C = pad_chain_batch(
        cands, ncand, cov, cons, geno, multiple=multiple)
    with pltpu.force_tpu_interpret_mode():
        ref_states, ref_costs = fn(pca, pnc, pco, pcs, pge,
                                   counts_table, valid_table, **kw)
        dev_states, dev_costs = fn(cands, ncand, cov, cons, geno,
                                   counts_table, valid_table,
                                   pad_to=multiple, **kw)
    assert dev_states.shape[0] == len(dps)
    assert np.array_equal(np.asarray(dev_states),
                          np.asarray(ref_states)[:len(dps)])
    assert np.array_equal(np.asarray(dev_costs),
                          np.asarray(ref_costs)[:len(dps)])
