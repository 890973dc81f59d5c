"""Banded scoring == dense scoring on the band, at any block size."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.readset import build_chain_readsets
from ahsoka_tpu.score.banded import score_pairs_banded
from ahsoka_tpu.score.pairwise import readset_to_matrix, score_pairs

from test_device_parity import _sim_chain_inputs


def _dense_edges(scores):
    iu = np.triu_indices(scores.shape[0], k=1)
    mask = scores[iu] != 0
    return iu[0][mask], iu[1][mask], scores[iu][mask]


@pytest.mark.parametrize("block", [4, 16, 1024])
def test_banded_matches_dense(block):
    cfg = PhasingConfig()
    bubble_paths, alignments = _sim_chain_inputs(0.05, num_bubbles=8,
                                                 reads_per_hap=16)
    rs = build_chain_readsets(bubble_paths, alignments, cfg)
    matrix = readset_to_matrix(rs.partial_filtered)
    dense = score_pairs(matrix, cfg)
    du, dv, dw = _dense_edges(dense)
    bu, bv, bw = score_pairs_banded(matrix, cfg, block=block)
    order = np.lexsort((bv, bu))
    bu, bv, bw = bu[order], bv[order], bw[order]
    assert np.array_equal(du, bu)
    assert np.array_equal(dv, bv)
    np.testing.assert_allclose(bw, dw, rtol=1e-4, atol=1e-4)


def test_banded_large_chain_end_to_end(tmp_path):
    """A chain above the banded threshold phases correctly."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from util import simulate_diploid
    from ahsoka_tpu.pipeline import run_phase
    from test_phase_e2e import _parse_result

    glines, gaf, hapA, hapB = simulate_diploid(
        num_bubbles=40, reads_per_hap=120, span=4, error_rate=0.02)
    (tmp_path / "g.gfa").write_text("".join(glines))
    (tmp_path / "r.gaf").write_text("".join(gaf))
    cfg = dataclasses.replace(
        PhasingConfig(backend="jax", debug_readset_files=False),
        banded_scoring_threshold=100)   # force the banded path
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "b"), cfg)
    chains = _parse_result(str(tmp_path / "b-result.txt"))
    haps = chains[next(iter(chains))]
    sA, sB = set(hapA), set(hapB)
    b0 = set(haps[0]) & (sA | sB)
    purity = max(len(b0 & sA), len(b0 & sB)) / max(len(b0), 1)
    assert purity > 0.9, f"purity {purity}"
