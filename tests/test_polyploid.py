"""Tetraploid end-to-end phase (ploidy-4 partition DP, BASELINE config 3)."""

import re

import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_phase

from util import simulate_polyploid
from test_phase_e2e import _parse_result


@pytest.mark.parametrize("backend", ["host", "jax"])
def test_tetraploid_phase_recovers_four_haplotypes(tmp_path, backend):
    glines, gaf, haps = simulate_polyploid(ploidy=4, num_bubbles=5,
                                           reads_per_hap=10)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    out = str(tmp_path / backend)
    # no genotype prior for the 4-allele bubbles: rely on coverage +
    # switch costs (the reference pins diploid {0:1,1:1}; SURVEY.md §5
    # notes the DP itself is ploidy-generic)
    cfg = PhasingConfig(ploidy=4, backend=backend, use_genotypes=False)
    run_phase(str(gfa), str(gaff), out, cfg)

    chains = _parse_result(out + "-result.txt")
    assert len(chains) == 1
    out_haps = chains[next(iter(chains))]
    assert len(out_haps) == 4
    branch_sets = [frozenset(h) for h in haps]
    got = []
    for line_nodes in out_haps:
        s = set(line_nodes)
        matches = [bs for bs in branch_sets if bs <= s]
        assert len(matches) == 1, f"haplotype line {sorted(s)} matches " \
                                  f"{len(matches)} branch sets"
        got.append(matches[0])
    assert set(got) == set(branch_sets)


def test_tetraploid_with_balanced_genotype_prior(tmp_path):
    """Ploidy-4 e2e with the genotype conformity cost ON, using the
    balanced k-allele prior (config.genotype_prior='balanced'): the
    4-branch bubbles get a {a:1, b:1, c:1, d:1} target the reference's
    diploid {0:1,1:1} cannot express.  The prior *helps* here: it
    penalises DP states that drop one of the four haplotype branches,
    which pure coverage cost tolerates on noisy data."""
    glines, gaf, haps = simulate_polyploid(ploidy=4, num_bubbles=5,
                                           reads_per_hap=10)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    out = str(tmp_path / "prior")
    cfg = PhasingConfig(ploidy=4, backend="jax", use_genotypes=True,
                        genotype_prior="balanced")
    run_phase(str(gfa), str(gaff), out, cfg)
    chains = _parse_result(out + "-result.txt")
    out_haps = chains[next(iter(chains))]
    assert len(out_haps) == 4
    branch_sets = [frozenset(h) for h in haps]
    got = []
    for line_nodes in out_haps:
        s = set(line_nodes)
        matches = [bs for bs in branch_sets if bs <= s]
        assert len(matches) == 1
        got.append(matches[0])
    assert set(got) == set(branch_sets)


def test_balanced_genotypes_values():
    import numpy as np
    from ahsoka_tpu.cluster.postprocess import balanced_genotypes

    totals = np.array([[10, 9, 11, 10, 0],       # 4 observed alleles
                       [20, 20, 0, 0, 0],        # biallelic balanced
                       [40, 0, 0, 0, 1]])        # heavy skew
    g = balanced_genotypes(totals, 4)
    assert g.tolist() == [[1, 1, 1, 1, 0],
                          [2, 2, 0, 0, 0],
                          [3, 0, 0, 0, 1]]
    assert (g.sum(axis=1) == 4).all()


def test_tetraploid_backends_agree(tmp_path):
    glines, gaf, _ = simulate_polyploid(ploidy=4, num_bubbles=4,
                                        reads_per_hap=8)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    cfg_h = PhasingConfig(ploidy=4, backend="host", use_genotypes=False)
    cfg_j = PhasingConfig(ploidy=4, backend="jax", use_genotypes=False)
    run_phase(str(gfa), str(gaff), str(tmp_path / "h"), cfg_h)
    run_phase(str(gfa), str(gaff), str(tmp_path / "j"), cfg_j)
    assert (tmp_path / "h-result.txt").read_text() == \
        (tmp_path / "j-result.txt").read_text()
