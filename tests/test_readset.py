"""Readset construction (projection) semantics."""

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.io.gaf import Alignment
from ahsoka_tpu.project.readset import (build_chain_readsets,
                                        build_full_readset, full_contained,
                                        partial_inner)

CFG = PhasingConfig()

BUBBLE_PATHS = {
    0: [[1, 2, 4], [1, 3, 4]],
    1: [[4, 5, 7], [4, 6, 7]],
}


def aln(name, nodes, identity, order=0):
    return Alignment(name=name, node_ids=list(nodes),
                     node_plus=[True] * len(nodes), start=0, end=100,
                     identity=identity, order=order)


def test_full_containment_semantics():
    assert full_contained([1, 2, 4], frozenset({1, 2, 4, 5}))
    assert not full_contained([1, 2, 4], frozenset({1, 4, 5}))
    assert partial_inner([1, 2, 4]) == [2]
    assert partial_inner([4, 9, 8, 1]) == [9, 8]
    assert partial_inner([1, 4]) == ()       # empty -> matches everything
    assert partial_inner([1]) == ()


def test_full_pass_variants_and_mapq():
    alns = [aln("r1", [1, 2, 4, 5, 7], 0.99),
            aln("r2", [1, 3, 4, 6], 0.95)]
    rs = build_full_readset(BUBBLE_PATHS, alns, CFG)
    r1 = rs.get_by_name("r1")
    assert r1.mapq == 99
    assert list(zip(r1.positions, r1.alleles)) == [(0, 0), (1, 0)]
    r2 = rs.get_by_name("r2")
    # bubble 1 allele path [4,6,7] not fully contained (no node 7)
    assert list(zip(r2.positions, r2.alleles)) == [(0, 1)]


def test_mapq_truncates_like_int_cast():
    alns = [aln("r", [1, 2, 4, 5, 7], 0.9299999)]
    rs = build_full_readset(BUBBLE_PATHS, alns, CFG)
    assert rs.get_by_name("r").mapq == 92   # int(92.99999) == 92


def test_first_alignment_wins_mapq():
    alns = [aln("r", [1, 2, 4], 0.99), aln("r", [1, 2, 4], 0.80)]
    rs = build_full_readset(BUBBLE_PATHS, alns, CFG)
    assert rs.get_by_name("r").mapq == 99


def test_partial_pass_completes_boundary_variants():
    alns = [aln("r1", [1, 2, 4, 5, 7], 0.99),
            aln("r2", [1, 3, 4, 6], 0.95)]
    out = build_chain_readsets(BUBBLE_PATHS, alns, CFG)
    # r2 only has 1 full variant (filtered out of the full testset) but the
    # partial pass matches inner node 6 at position 1
    r2 = out.partial_filtered.get_by_name("r2")
    assert r2 is not None
    assert list(zip(r2.positions, r2.alleles)) == [(0, 1), (1, 1)]
    # sweep covers 0..last-1 plus the boundary extension to last and last+1
    assert out.projected_positions == [0, 1, 2]


def test_partial_identity_gate_strictly_greater_90():
    # creation is ungated, but adding to an existing read requires
    # identity*100 > 90.  The 'anchor' read keeps position 1 in the sweep
    # (boundary extension needs a filtered full-pass read ending there).
    alns = [aln("anchor", [1, 2, 4, 5, 7], 0.99),
            aln("lo", [1, 2, 4, 5, 7], 0.90),
            aln("hi", [1, 2, 4, 5, 7], 0.905)]
    out = build_chain_readsets(BUBBLE_PATHS, alns, CFG)
    lo = out.partial.get_by_name("lo")
    assert lo.variant_count() == 1          # 90.0 > 90 is false
    hi = out.partial.get_by_name("hi")
    assert hi.variant_count() >= 2          # 90.5 > 90 passes
    # both fail the mapq >= 93 filter though
    assert out.partial_filtered.get_by_name("lo") is None
    assert out.partial_filtered.get_by_name("hi") is None


def test_filter_thresholds():
    alns = [aln("keep", [1, 2, 4, 5, 7], 0.93),
            aln("lowq", [1, 2, 4, 5, 7], 0.92),
            aln("onevar", [1, 2, 4], 0.99)]
    out = build_chain_readsets(BUBBLE_PATHS, alns, CFG)
    names = {r.name for r in out.partial_filtered}
    assert "keep" in names
    assert "lowq" not in names
    # 'onevar' gains a partial variant at position 1? its nodes [1,2,4]
    # contain inner node sets {2} (pos 0) but not {5}/{6} (pos 1), and the
    # empty-inner case does not arise here -> stays single-variant
    assert "onevar" not in names
