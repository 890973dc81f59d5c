"""GFA parser unit tests."""

import pytest

from ahsoka_tpu.io.gfa import GfaParseError, parse_gfa, raw_id

from util import gfa_lines


def test_raw_id_strips_nondigits():
    assert raw_id("utg000013l") == 13
    assert raw_id("s42") == 42
    with pytest.raises(GfaParseError):
        raw_id("nodigits")


def test_parse_nodes_and_edges():
    lines = gfa_lines(3, [(1, "+", 2, "+"), (2, "-", 3, "-")],
                      seqs={1: "ACGTACGT"}, symmetric=False)
    g = parse_gfa(lines)
    assert g.node_order == [1, 2, 3]
    assert g.seq_len[1] == 8
    assert g.edges[(1, True)] == [(2, True)]
    assert g.edges[(2, False)] == [(3, False)]
    assert g.offsets[((1, True), (2, True))] == 0


def test_overlap_cigar():
    lines = ["S\ta1\tACGT\n", "S\ta2\tTTTT\n", "L\ta1\t+\ta2\t+\t3M\n"]
    g = parse_gfa(lines)
    assert g.offsets[((1, True), (2, True))] == 3
    bad = ["S\ta1\tACGT\n", "S\ta2\tTTTT\n", "L\ta1\t+\ta2\t+\t3S\n"]
    with pytest.raises(GfaParseError):
        parse_gfa(bad)
    zero_s = ["S\ta1\tACGT\n", "S\ta2\tTTTT\n", "L\ta1\t+\ta2\t+\t0S\n"]
    assert parse_gfa(zero_s).offsets[((1, True), (2, True))] == 0


def test_missing_segment_strict():
    lines = ["S\ta1\tACGT\n", "L\ta1\t+\ta9\t+\t0M\n"]
    with pytest.raises(GfaParseError):
        parse_gfa(lines, strict=True)
    g = parse_gfa(lines, strict=False)
    assert g.node_order == [1, 9]


def test_out_in_edges_direction_convention():
    # travel_dir 0 follows '+' adjacency; in_edges is opposite adjacency
    lines = gfa_lines(2, [(1, "+", 2, "+")], symmetric=True)
    g = parse_gfa(lines)
    assert g.out_edges(1, 0) == [(2, True)]
    assert g.out_edges(1, 1) == []
    assert g.in_edges(2, 0) == [(1, False)]
    # reverse line gives node 2 '-' adjacency back to 1
    assert g.out_edges(2, 1) == [(1, False)]


def test_get_edge_prefers_plus_orientation():
    lines = gfa_lines(2, [(1, "+", 2, "+")], symmetric=True)
    g = parse_gfa(lines)
    assert g.get_edge(1, 2) == ((1, True), (2, True))
    assert g.get_edge(2, 1) == ((2, False), (1, False))
    assert g.get_edge(1, 1) is None
