"""Bubble/chain detection against hand-computed tiny graphs."""

import io

from ahsoka_tpu.emit import write_bubbleinfo
from ahsoka_tpu.graph.alleles import enumerate_allele_paths
from ahsoka_tpu.graph.bubbles import find_bubbles
from ahsoka_tpu.io.gfa import parse_gfa

from util import bubble_chain_gfa, gfa_lines


def test_single_diamond_bubble():
    # 1 -> {2,3} -> 4, symmetric edges.  std iteration order of ids 1..4 is
    # 4,3,2,1, so the sweep starts at node 4 travelling '-' and finds the
    # bubble source=4, inner=[2,3] (pop order), sink=1.
    lines = gfa_lines(4, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    assert len(index.chains) == 1
    (chain,) = index.chains
    assert chain.id == 0
    assert [b.node_ids() for b in chain.bubbles] == [[4, 2, 3, 1]]
    assert index.chain_of_node(2) == 0
    assert index.bubble_of_node(2) == 0


def test_two_bubble_chain():
    # 1 -> {2,3} -> 4 -> {5,6} -> 7; start node is 7 (std order reversed),
    # so the chain runs right-to-left: bubbles (7,[5,6],4), (4,[2,3],1).
    lines = gfa_lines(7, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+"),
                          (4, "+", 5, "+"), (4, "+", 6, "+"),
                          (5, "+", 7, "+"), (6, "+", 7, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    assert len(index.chains) == 1
    bubbles = index.chains[0].bubbles
    assert [b.node_ids() for b in bubbles] == [[7, 5, 6, 4], [4, 2, 3, 1]]
    assert [b.id for b in bubbles] == [0, 1]
    # shared anchor 4 is stamped by the later bubble (last write wins)
    assert index.bubble_of_node(4) == 1


def test_tip_breaks_sweep():
    # diamond with an extra tip hanging off node 2's branch: 2 -> 8 (dead end)
    lines = gfa_lines(8, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+"),
                          (2, "+", 8, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    # the bubble with the tip is aborted whenever the tip node is popped
    # first; chains may still form from other sweep starts — just assert no
    # crash and stamps are consistent
    for chain in index.chains:
        for bubble in chain.bubbles:
            assert bubble.source != bubble.sink


def test_loop_aborts_bubble():
    # 1 -> 2 -> 1 cycle: sweep from either end must abort without a bubble
    lines = gfa_lines(2, [(1, "+", 2, "+"), (2, "+", 1, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    assert index.chains == []


def test_direct_edge_terminates_chain():
    # a single edge source->sink (two swept nodes) emits nothing
    lines = gfa_lines(2, [(1, "+", 2, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    assert index.chains == []


def test_long_chain_no_recursion_limit():
    lines = bubble_chain_gfa(num_bubbles=3000)
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    assert len(index.chains) == 1
    assert len(index.chains[0].bubbles) == 3000


def test_bubbleinfo_format():
    lines = gfa_lines(4, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+")])
    index = find_bubbles(parse_gfa(lines))
    buf = io.StringIO()
    write_bubbleinfo(index, buf)
    assert buf.getvalue() == (
        "chain id: 0size: 1\n"
        "bubble id: 0\n"
        "node id: 4,2,3,1,\n")


def test_allele_paths_simple_bubble():
    lines = gfa_lines(4, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    table = enumerate_allele_paths(graph, index)
    # simple bubble (2 inner nodes): one [source, inner, sink] path per inner
    assert table == {0: {0: [[4, 2, 1], [4, 3, 1]]}}


def test_allele_paths_complex_bubble():
    # 1 -> {2,3,5} -> 4: three branches, not a "simple" bubble (3 inner)
    lines = gfa_lines(5, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (1, "+", 5, "+"), (2, "+", 4, "+"),
                          (3, "+", 4, "+"), (5, "+", 4, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    (chain,) = index.chains
    (bubble,) = chain.bubbles
    assert len(bubble.inner) == 3
    table = enumerate_allele_paths(graph, index)
    paths = table[chain.id][bubble.id]
    # DFS from the sink: each path is sink -> branch -> source
    assert sorted(map(tuple, paths)) == sorted(
        [(bubble.sink, b, bubble.source) for b in bubble.inner])
