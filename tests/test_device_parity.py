"""Device (JAX) backends must reproduce the host oracle exactly."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.readset import build_chain_readsets

from util import simulate_diploid
from test_dp import random_dp_inputs


def _readsets_equal(a, b):
    assert len(a.reads) == len(b.reads)
    for ra, rb in zip(a.reads, b.reads):
        assert ra.name == rb.name, (ra.name, rb.name)
        assert ra.mapq == rb.mapq
        assert ra.positions == rb.positions
        assert ra.alleles == rb.alleles


def _sim_chain_inputs(error_rate=0.05, num_bubbles=6, reads_per_hap=10):
    import tempfile, os
    from ahsoka_tpu.pipeline import prepare_phase_inputs
    glines, gaf, _, _ = simulate_diploid(
        num_bubbles=num_bubbles, reads_per_hap=reads_per_hap,
        error_rate=error_rate)
    with tempfile.TemporaryDirectory() as d:
        gfa_p = os.path.join(d, "g.gfa")
        gaf_p = os.path.join(d, "r.gaf")
        open(gfa_p, "w").writelines(glines)
        open(gaf_p, "w").writelines(gaf)
        art = prepare_phase_inputs(gfa_p, gaf_p, os.path.join(d, "o"),
                                   PhasingConfig())
    chain_id = art.size_sorting[0][1]
    return (art.allele_paths[chain_id],
            art.alignments.chain_alignments(chain_id))


@pytest.mark.parametrize("error_rate", [0.0, 0.08])
def test_projection_device_matches_oracle(error_rate):
    from ahsoka_tpu.project.device import build_chain_readsets_device
    cfg = PhasingConfig()
    bubble_paths, alignments = _sim_chain_inputs(error_rate)
    host = build_chain_readsets(bubble_paths, alignments, cfg)
    dev = build_chain_readsets_device(bubble_paths, alignments, cfg)
    _readsets_equal(host.full, dev.full)
    _readsets_equal(host.full_filtered, dev.full_filtered)
    _readsets_equal(host.partial, dev.partial)
    _readsets_equal(host.partial_filtered, dev.partial_filtered)
    assert host.projected_positions == dev.projected_positions


def test_projection_device_mixed_identities():
    from ahsoka_tpu.project.device import build_chain_readsets_device
    from ahsoka_tpu.io.gaf import Alignment
    cfg = PhasingConfig()
    bubble_paths = {0: [[1, 2, 4], [1, 3, 4]], 1: [[4, 5, 7], [4, 6, 7]]}
    idents = [0.99, 0.95, 0.93, 0.905, 0.90, 0.80]
    alignments = []
    for i, ident in enumerate(idents):
        nodes = [1, 2, 4, 5, 7] if i % 2 == 0 else [1, 3, 4, 6, 7]
        alignments.append(Alignment(
            name=f"r{i % 4}", node_ids=nodes,
            node_plus=[True] * len(nodes), start=0, end=10,
            identity=ident, order=i))
    host = build_chain_readsets(bubble_paths, alignments, cfg)
    dev = build_chain_readsets_device(bubble_paths, alignments, cfg)
    _readsets_equal(host.partial, dev.partial)
    _readsets_equal(host.full, dev.full)


def test_scoring_device_matches_oracle():
    from ahsoka_tpu.score.device import score_pairs_device
    from ahsoka_tpu.score.pairwise import readset_to_matrix, score_pairs
    cfg = PhasingConfig()
    bubble_paths, alignments = _sim_chain_inputs(0.05)
    rs = build_chain_readsets(bubble_paths, alignments, cfg)
    m = readset_to_matrix(rs.partial_filtered)
    host = score_pairs(m, cfg)
    dev = score_pairs_device(m, cfg)
    assert host.shape == dev.shape
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("ploidy", [2, 4])
def test_dp_device_matches_oracle(seed, ploidy):
    from ahsoka_tpu.thread.dp_host import thread_chain
    from ahsoka_tpu.thread.dp_jax import thread_chain_device
    cfg = PhasingConfig(ploidy=ploidy)
    dp = random_dp_inputs(P=12, ploidy=ploidy, num_clusters=6, seed=seed)
    host = thread_chain(dp, cfg)
    dev = thread_chain_device(dp, cfg)
    assert [sorted(t) for t in host] == [sorted(t) for t in dev]


def test_phase_e2e_jax_backend(tmp_path):
    from ahsoka_tpu.pipeline import run_phase
    glines, gaf, hapA, hapB = simulate_diploid(num_bubbles=5,
                                               reads_per_hap=8)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    out_host = str(tmp_path / "host")
    out_jax = str(tmp_path / "jax")
    run_phase(str(gfa), str(gaff), out_host, PhasingConfig(backend="host"))
    run_phase(str(gfa), str(gaff), out_jax, PhasingConfig(backend="jax"))
    host_text = open(out_host + "-result.txt").read()
    jax_text = open(out_jax + "-result.txt").read()
    assert host_text == jax_text
    assert "haplotype 1:" in host_text


def test_batched_projection_matches_per_chain(tmp_path):
    """containment_key_tables_many == per-chain containment_key_tables
    across heterogeneous chains (multiple shape-bucket groups, incl. a
    group of one)."""
    from util import simulate_multichain

    from ahsoka_tpu.pipeline import prepare_phase_inputs
    from ahsoka_tpu.project.device import (containment_key_tables,
                                           containment_key_tables_many,
                                           prepare_chain_inputs)

    cfg = PhasingConfig(backend="jax")
    inputs_list = []
    for tag, (nc, bpc, rph) in enumerate(
            [(3, 6, 7), (1, 40, 40)]):   # two very different shape buckets
        glines, gaf = simulate_multichain(num_chains=nc,
                                          bubbles_per_chain=bpc,
                                          reads_per_hap=rph,
                                          error_rate=0.1, seed=3 + tag)
        gfa = tmp_path / f"g{tag}.gfa"
        gfa.write_text("".join(glines))
        gaff = tmp_path / f"r{tag}.gaf"
        gaff.write_text("".join(gaf))
        art = prepare_phase_inputs(str(gfa), str(gaff),
                                   str(tmp_path / f"o{tag}"), cfg)
        inputs_list += [
            prepare_chain_inputs(art.allele_paths[cid],
                                 art.alignments.chain_alignments(cid))
            for _, cid in art.size_sorting]
    batched = containment_key_tables_many(inputs_list, cfg)
    assert len(batched) == len(inputs_list) == 4
    for inputs, tabs in zip(inputs_list, batched):
        expect = containment_key_tables(inputs, cfg)
        for got, want in zip(tabs, expect):
            np.testing.assert_array_equal(got, want)
