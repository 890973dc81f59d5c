"""Beam-pruned threading DP (dp_beam_width, the WhatsHap rowLimit
analog): exactness at full width, stability under mild pruning, and the
ploidy-6 path it exists for."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread.dp_jax import (dp_forward_core,
                                      dp_forward_beam_core,
                                      _backtrace, _backtrace_beam,
                                      _beam_states_to_path,
                                      thread_chain_device)
from ahsoka_tpu.thread.states import (full_state_counts,
                                      full_state_validity, num_states)

import jax.numpy as jnp


def _workload(P=12, ploidy=3, seed=0):
    rng = np.random.default_rng(seed)
    M = 2 * ploidy
    cands = np.sort(rng.integers(0, 3 * ploidy, size=(P, M)),
                    axis=1).astype(np.int32)
    # dedupe within a row (candidates are distinct cluster ids)
    for j in range(P):
        row = np.unique(cands[j])
        cands[j] = np.pad(row, (0, M - len(row)),
                          constant_values=-1)[:M]
    ncand = (cands >= 0).sum(axis=1).astype(np.int32)
    cov = rng.random((P, M)).astype(np.float32) + 0.05
    cov *= cands >= 0
    cov /= cov.sum(axis=1, keepdims=True)
    cons = rng.integers(0, 2, size=(P, M)).astype(np.int32)
    geno = np.zeros((P, 2), dtype=np.float32)
    geno[:, 0] = (ploidy + 1) // 2
    geno[:, 1] = ploidy // 2
    return cands, ncand, cov, cons, geno


def _run_exact(args, ploidy):
    ct = jnp.asarray(full_state_counts(ploidy))
    vt = jnp.asarray(full_state_validity(ploidy))
    fs, bp = dp_forward_core(
        *[jnp.asarray(a) for a in args], ct, vt, ploidy=ploidy,
        num_alleles=2, switch_cost=jnp.float32(32.0),
        affine_cost=jnp.float32(8.0), cov_w=jnp.float32(1.0),
        geno_w=jnp.float32(1.0))
    s0, tail = _backtrace(fs, bp)
    return np.concatenate([[int(s0)], np.asarray(tail)])


def _run_beam(args, ploidy, B):
    ct = jnp.asarray(full_state_counts(ploidy))
    vt = jnp.asarray(full_state_validity(ploidy))
    fslot, beam_states, bps = dp_forward_beam_core(
        *[jnp.asarray(a) for a in args], ct, vt, ploidy=ploidy,
        num_alleles=2, switch_cost=jnp.float32(32.0),
        affine_cost=jnp.float32(8.0), cov_w=jnp.float32(1.0),
        geno_w=jnp.float32(1.0), beam_width=B)
    s0, tail = _backtrace_beam(fslot, bps)
    return _beam_states_to_path(beam_states, s0, tail,
                                args[0].shape[0])


@pytest.mark.parametrize("ploidy", [2, 3])
def test_full_width_beam_equals_exact(ploidy):
    args = _workload(P=16, ploidy=ploidy, seed=1)
    S = num_states(2 * ploidy, ploidy)
    exact = _run_exact(args, ploidy)
    beam = _run_beam(args, ploidy, S)
    assert (exact == beam).all()
    # and wider than S changes nothing
    beam2 = _run_beam(args, ploidy, S + 7)
    assert (exact == beam2).all()


def test_mild_pruning_keeps_optimum():
    ploidy = 3
    args = _workload(P=16, ploidy=ploidy, seed=2)
    S = num_states(2 * ploidy, ploidy)      # 56
    exact = _run_exact(args, ploidy)
    beam = _run_beam(args, ploidy, S - 8)
    assert (exact == beam).all()


def test_ploidy6_requires_beam():
    with pytest.raises(ValueError, match="dp_beam_width"):
        PhasingConfig(ploidy=6)
    cfg = PhasingConfig(ploidy=6, dp_beam_width=512)
    assert cfg.dp_beam_width == 512


def test_ploidy6_rejects_beam_at_or_above_s():
    """A beam >= S would silently disable pruning (_beam_width_for) and
    run the exact [12376, 12376] path the ploidy-6 check exists to
    prevent — validation must reject it up front."""
    S = num_states(2 * 6, 6)            # 12376
    for bw in (S, S + 1, 16384):
        with pytest.raises(ValueError, match="full-width"):
            PhasingConfig(ploidy=6, dp_beam_width=bw)
    # just-below-S beams remain valid
    assert PhasingConfig(ploidy=6, dp_beam_width=S - 1)


def test_dp_cells_scales_with_active_beam():
    """dp_cells (the metrics numerator) must count (P-1)*B*S when the
    beam is active, not (P-1)*S*S (advisor r4: ~6x overstatement at
    ploidy 6 / beam 2048)."""
    from ahsoka_tpu.phase import _dp_frontier_width

    S = num_states(2 * 6, 6)
    cfg = PhasingConfig(ploidy=6, dp_beam_width=2048)
    assert _dp_frontier_width(cfg, S) == 2048
    # exact configs keep the full frontier
    assert _dp_frontier_width(PhasingConfig(ploidy=2), 10) == 10
    # beam configured but S <= beam -> beam inactive -> full width
    assert _dp_frontier_width(
        PhasingConfig(ploidy=4, dp_beam_width=4096), 330) == 330


def test_ploidy6_chain_threads():
    """A small ploidy-6 instance threads end to end through the beam
    path (thread_chain_device dispatch)."""
    from ahsoka_tpu.cluster.postprocess import DPInputs

    ploidy, P, M = 6, 6, 12
    rng = np.random.default_rng(3)
    cands = np.tile(np.arange(M, dtype=np.int32), (P, 1))
    ncand = np.full(P, M, dtype=np.int32)
    cov = np.full((P, M), 1.0 / M, dtype=np.float32)
    # make the first 6 clusters clearly dominant
    cov[:, :6] = 1.5 / M
    cov /= cov.sum(axis=1, keepdims=True)
    cons = (np.arange(M) % 2).astype(np.int32) * np.ones(
        (P, M), dtype=np.int32)
    geno = np.zeros((P, 2), dtype=np.int32)
    geno[:, 0], geno[:, 1] = 3, 3
    dp = DPInputs(positions=np.arange(P, dtype=np.int32),
                  candidates=cands, num_candidates=ncand,
                  coverage=cov, consensus=cons, genotypes=geno)
    cfg = PhasingConfig(ploidy=6, dp_beam_width=256,
                        debug_readset_files=False)
    path = thread_chain_device(dp, cfg)
    assert len(path) == P
    assert all(len(t) == 6 for t in path)
    _ = rng  # noqa: F841


def test_ploidy5_e2e_recovers_haplotypes(tmp_path):
    """Pentaploid e2e through the EXACT DP (S = 2002 states, the
    largest exact configuration)."""
    from ahsoka_tpu.pipeline import run_phase
    from ahsoka_tpu.utils.accuracy import score_phased_output
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    gfa, gaf = str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf")
    truth = str(tmp_path / "g.truth")
    out = str(tmp_path / "out")
    write_synthetic(gfa, gaf,
                    SynthSpec(num_chains=1, bubbles_per_chain=6,
                              reads_per_hap=10, ploidy=5, span=4,
                              error_rate=0.0),
                    truth_path=truth)
    cfg = PhasingConfig(ploidy=5, genotype_prior="balanced",
                        debug_readset_files=False)
    run_phase(gfa, gaf, out, cfg)
    acc = score_phased_output(out, truth)
    assert acc["phased_bubble_frac"] == 1.0
    assert acc["switch_err_vs_truth"] == 0.0
    assert acc["hamming_vs_truth"] == 0.0


def test_ploidy6_e2e_recovers_haplotypes(tmp_path):
    """Full hexaploid pipeline: 6 planted haplotypes on an arity-6
    bubble chain, threaded through the beam DP, recovered exactly."""
    from ahsoka_tpu.pipeline import run_phase
    from ahsoka_tpu.utils.accuracy import score_phased_output
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    gfa, gaf = str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf")
    truth = str(tmp_path / "g.truth")
    out = str(tmp_path / "out")
    write_synthetic(gfa, gaf,
                    SynthSpec(num_chains=1, bubbles_per_chain=8,
                              reads_per_hap=12, ploidy=6, span=4,
                              error_rate=0.0),
                    truth_path=truth)
    cfg = PhasingConfig(ploidy=6, dp_beam_width=512,
                        genotype_prior="balanced",
                        debug_readset_files=False)
    run_phase(gfa, gaf, out, cfg)
    acc = score_phased_output(out, truth)
    assert acc["phased_bubble_frac"] == 1.0
    assert acc["switch_err_vs_truth"] == 0.0
    assert acc["hamming_vs_truth"] == 0.0
