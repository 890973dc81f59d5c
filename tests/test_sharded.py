"""Multi-device sharded projection == single-device (8 virtual CPUs)."""

import dataclasses

import jax
import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.device import (SparseKeys, containment_key_tables,
                                       prepare_chain_inputs)

from test_device_parity import _sim_chain_inputs


def _dense(t):
    """Normalise a winner table for content comparison (big blocked
    tables come back as SparseKeys COO)."""
    return t.to_dense() if isinstance(t, SparseKeys) else np.asarray(t)


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_sharded_projection_matches_single_device(shards):
    if len(jax.devices()) < shards:
        pytest.skip(f"need {shards} devices")
    bubble_paths, alignments = _sim_chain_inputs(0.05, num_bubbles=6,
                                                 reads_per_hap=12)
    inputs = prepare_chain_inputs(bubble_paths, alignments)
    single = containment_key_tables(inputs, PhasingConfig())
    sharded = containment_key_tables(
        inputs, dataclasses.replace(PhasingConfig(), data_shards=shards),
        chunk=256)
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("shards", [1, 4])
def test_bubble_blocked_projection_matches_unblocked(shards, monkeypatch):
    """Oversized key tables run in exact bubble blocks (the config-2 HBM
    OOM fix); results must match the single-carry kernel, sharded or
    not."""
    if len(jax.devices()) < shards:
        pytest.skip(f"need {shards} devices")
    import ahsoka_tpu.project.device as pd

    bubble_paths, alignments = _sim_chain_inputs(0.05, num_bubbles=9,
                                                 reads_per_hap=11)
    inputs = prepare_chain_inputs(bubble_paths, alignments)
    cfg = dataclasses.replace(PhasingConfig(), data_shards=shards)
    single = containment_key_tables(inputs, cfg)
    monkeypatch.setattr(pd, "_KEY_TABLE_BUDGET", 64)   # force ~B blocks
    blocked = containment_key_tables(inputs, cfg)
    monkeypatch.undo()
    for a, b in zip(single, blocked):
        assert np.array_equal(_dense(a), _dense(b))


def test_batched_prepass_routes_oversized_chains_blocked(monkeypatch):
    """containment_key_tables_many must route chains whose key tables
    exceed the HBM budget through the bubble-blocked per-chain path,
    with identical results."""
    import ahsoka_tpu.project.device as pd
    from ahsoka_tpu.project.device import containment_key_tables_many

    chains = [_sim_chain_inputs(0.05, num_bubbles=nb, reads_per_hap=9)
              for nb in (5, 7)]
    inputs = [prepare_chain_inputs(bp, al) for bp, al in chains]
    cfg = PhasingConfig()
    expected = containment_key_tables_many(inputs, cfg)
    monkeypatch.setattr(pd, "_KEY_TABLE_BUDGET", 64)
    blocked = containment_key_tables_many(inputs, cfg)
    monkeypatch.undo()
    for exp, got in zip(expected, blocked):
        for a, b in zip(exp, got):
            assert np.array_equal(_dense(a), _dense(b))


def test_sparse_key_fetch_matches_dense(monkeypatch):
    """Device-compacted COO fetch of the projection key tables must be
    byte-identical to the dense fetch (the config-2 fetch-bandwidth
    fix)."""
    import ahsoka_tpu.project.device as pd

    bubble_paths, alignments = _sim_chain_inputs(0.06, num_bubbles=7,
                                                 reads_per_hap=13)
    inputs = prepare_chain_inputs(bubble_paths, alignments)
    dense = containment_key_tables(inputs, PhasingConfig())
    monkeypatch.setattr(pd, "_SPARSE_FETCH_CELLS", 1)   # force COO fetch
    sparse = containment_key_tables(inputs, PhasingConfig())
    monkeypatch.undo()
    for a, b in zip(dense, sparse):
        assert np.array_equal(_dense(a), _dense(b))


@pytest.mark.parametrize("shards", [2, 4, 8])
@pytest.mark.parametrize("mode", ["whatshap", "fresh"])
def test_sharded_scoring_matches_single_device(shards, mode):
    """Row-sharded pair scoring == single-device kernel, exactly (the
    VERDICT r2 'pairwise-score partials never shard' gap)."""
    if len(jax.devices()) < shards:
        pytest.skip(f"need {shards} devices")
    from ahsoka_tpu.score.device import score_pairs_device
    from ahsoka_tpu.project.readset import build_chain_readsets
    from ahsoka_tpu.score.pairwise import readset_to_matrix

    bubble_paths, alignments = _sim_chain_inputs(0.08, num_bubbles=6,
                                                 reads_per_hap=15)
    cfg = PhasingConfig(score_mode=mode)
    matrix = readset_to_matrix(
        build_chain_readsets(bubble_paths, alignments,
                             cfg).partial_filtered)
    single = score_pairs_device(matrix, cfg)
    sharded = score_pairs_device(
        matrix, dataclasses.replace(cfg, data_shards=shards))
    assert np.array_equal(single, sharded)


def test_sharded_phase_end_to_end(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    import sys
    sys.path.insert(0, "tests")
    from util import simulate_diploid
    from ahsoka_tpu.pipeline import run_phase

    glines, gaf, _, _ = simulate_diploid(num_bubbles=5, reads_per_hap=8)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    cfg1 = PhasingConfig(backend="jax", debug_readset_files=False)
    cfg4 = dataclasses.replace(cfg1, data_shards=4)
    run_phase(str(gfa), str(gaff), str(tmp_path / "s1"), cfg1)
    run_phase(str(gfa), str(gaff), str(tmp_path / "s4"), cfg4)
    assert (tmp_path / "s1-result.txt").read_text() == \
        (tmp_path / "s4-result.txt").read_text()


def test_full_pipeline_data_and_chain_sharded(tmp_path):
    """The VERDICT's 'phase --data-shards 4 --chain-shards 2' check: the
    FULL pipeline (multi-chain, noisy reads, batched driver) must produce
    byte-identical outputs on 1 device and on a 4x2 virtual mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    import sys
    sys.path.insert(0, "tests")
    from util import simulate_multichain
    from ahsoka_tpu.pipeline import run_phase

    glines, gaf = simulate_multichain(num_chains=4, bubbles_per_chain=6,
                                      reads_per_hap=10, error_rate=0.05,
                                      seed=3)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    base = PhasingConfig(backend="jax", debug_readset_files=False)
    mesh = dataclasses.replace(base, data_shards=4, chain_shards=2)
    run_phase(str(gfa), str(gaff), str(tmp_path / "m1"), base)
    run_phase(str(gfa), str(gaff), str(tmp_path / "m8"), mesh)
    for suffix in ("-result.txt", "-bubbleinfo.txt"):
        assert (tmp_path / f"m1{suffix}").read_bytes() == \
            (tmp_path / f"m8{suffix}").read_bytes(), suffix
    # chain files too (per-chain DP outputs ran on the sharded path)
    for f in sorted(tmp_path.glob("m1-chain*-result.txt")):
        other = tmp_path / f.name.replace("m1-", "m8-")
        assert f.read_bytes() == other.read_bytes(), f.name
