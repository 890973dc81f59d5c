"""Adversarial graph/parser coverage (VERDICT round-1 item 5): nested
complex bubbles vs hand-enumerated allele paths, cycles interacting with
the chain recursion, raw_id collisions, >=10-chain graphs, and GFA files
with L lines preceding S lines.  Each pins a semantics with a reference
citation."""

import dataclasses

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.graph.alleles import enumerate_allele_paths
from ahsoka_tpu.graph.bubbles import find_bubbles
from ahsoka_tpu.io.gfa import parse_gfa

from util import gfa_lines


def test_nested_complex_bubble_hand_enumerated():
    """A bubble whose interior itself forks: 1->{2,3}; 2->{5,6}; 5,6->7;
    3->7.  One complex bubble (4 inner nodes) whose alleles are exactly
    the three source->sink walks, in DFS order from the stored sink
    (findPathsComplex semantics, src/chainstoreadset.cpp:84-116: DFS from
    the sink, adjacency order, copy-on-branch)."""
    lines = gfa_lines(7, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 5, "+"), (2, "+", 6, "+"),
                          (5, "+", 7, "+"), (6, "+", 7, "+"),
                          (3, "+", 7, "+")])
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    (chain,) = index.chains
    (bubble,) = chain.bubbles
    # sweep starts at the std-order head (node 7) travelling '-'
    # (src/graph.cpp:339-341), so source=7, sink=1; inner in pop order
    assert (bubble.source, bubble.sink) == (7, 1)
    assert bubble.inner == [3, 5, 6, 2]
    table = enumerate_allele_paths(graph, index)
    # DFS from the stored sink (node 1): paths are the three walks
    # 1-2-5-7, 1-2-6-7, 1-3-7, emitted in adjacency order with the
    # branch prefix [1, 2] copied on the fork at node 2
    assert table == {0: {0: [[1, 2, 5, 7], [1, 2, 6, 7], [1, 3, 7]]}}


def test_deep_nested_forks_paths_are_walks():
    """Two stacked interior forks; every emitted allele path must be a
    contiguous walk and cover every source->sink route exactly once."""
    edges = [(1, "+", 2, "+"), (1, "+", 3, "+"),
             (2, "+", 4, "+"), (2, "+", 5, "+"),
             (4, "+", 6, "+"), (5, "+", 6, "+"),
             (6, "+", 8, "+"), (3, "+", 8, "+"),
             (3, "+", 7, "+"), (7, "+", 8, "+")]
    lines = gfa_lines(8, edges)
    graph = parse_gfa(lines)
    index = find_bubbles(graph)
    table = enumerate_allele_paths(graph, index)
    (chain,) = index.chains
    paths = table[chain.id][chain.bubbles[0].id]
    expected_routes = {(1, 2, 4, 6, 8), (1, 2, 5, 6, 8), (1, 3, 8),
                       (1, 3, 7, 8)}
    assert {tuple(p) for p in paths} == expected_routes
    adj = {}
    for a, _o1, b, _o2 in edges:
        adj.setdefault(a, set()).add(b)
    for p in paths:
        for x, y in zip(p, p[1:]):
            assert y in adj[x], f"{p} is not a walk"


def test_cycle_mid_chain_keeps_prior_bubbles():
    """Chain of two diamonds with a back edge 2->1 inside the *second*
    bubble the sweep reaches: the loop-to-start abort
    (src/graph.cpp:417-423) cancels that bubble but the chain keeps the
    bubble already emitted, and the recursion stops."""
    lines = gfa_lines(7, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+"),
                          (4, "+", 5, "+"), (4, "+", 6, "+"),
                          (5, "+", 7, "+"), (6, "+", 7, "+"),
                          (2, "+", 1, "+")])
    index = find_bubbles(parse_gfa(lines))
    assert [(c.id, [(b.source, b.inner, b.sink) for b in c.bubbles])
            for c in index.chains] == [(0, [(7, [5, 6], 4)])]


def test_cycle_in_first_bubble_aborts_whole_sweep():
    """Back edge in the first bubble the sweep explores: nothing is
    emitted (the abort happens before any bubble completes), and the
    nodes stay visited so no later sweep resurrects them."""
    lines = gfa_lines(7, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+"),
                          (4, "+", 5, "+"), (4, "+", 6, "+"),
                          (5, "+", 7, "+"), (6, "+", 7, "+"),
                          (5, "+", 4, "+")])
    index = find_bubbles(parse_gfa(lines))
    assert index.chains == []


def test_raw_id_collision_last_write_wins():
    """'utg000013l' and '13' both strip to id 13 (src/graph.cpp:161-165);
    the reference's ``nodes[id] = Node(id, seq)`` silently overwrites
    (src/graph.cpp:205), keeping the LAST sequence and the first-touch
    iteration position.  Both parser engines must agree."""
    col = ["S\tutg000013l\tAAAA\n", "S\t13\tGG\n", "S\t1\tA\n",
           "L\t1\t+\tutg000013l\t+\t0M\n"]
    g_py = parse_gfa(col)                       # lines -> Python engine
    assert g_py.node_order == [13, 1]
    assert g_py.seq_len == {13: 2, 1: 1}        # last S line's length
    assert g_py.edges == {(1, True): [(13, True)]}

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".gfa",
                                     delete=False) as fh:
        fh.writelines(col)
        path = fh.name
    g_nat = parse_gfa(path)                     # path -> native engine
    assert g_nat.node_order == g_py.node_order
    assert g_nat.seq_len == g_py.seq_len
    assert g_nat.edges == g_py.edges


def test_l_lines_before_s_lines():
    """L lines may precede S lines.  The reference default-constructs
    nodes at the L line and then *overwrites* them at the S line, losing
    the Node children lists (src/graph.cpp:205,241-244 — a latent bug);
    this parser keeps the adjacency (stored outside the node, like the
    reference's surviving ``graph.edges``) — a documented divergence.
    First-touch order still follows the L lines, so chain numbering
    matches the reference's unordered_map insertion order."""
    ls = ["L\t1\t+\t2\t+\t0M\n", "L\t1\t+\t3\t+\t0M\n",
          "L\t2\t+\t4\t+\t0M\n", "L\t3\t+\t4\t+\t0M\n",
          "L\t2\t-\t1\t-\t0M\n", "L\t3\t-\t1\t-\t0M\n",
          "L\t4\t-\t2\t-\t0M\n", "L\t4\t-\t3\t-\t0M\n"]
    ss = [f"S\t{i}\tACGT\n" for i in (1, 2, 3, 4)]
    g = parse_gfa(ls + ss)
    assert g.node_order == [1, 2, 3, 4]         # touched by the L lines
    g2 = parse_gfa(ss + ls)
    assert g.edges == g2.edges and g.seq_len == g2.seq_len
    index = find_bubbles(g)
    (chain,) = index.chains
    assert sorted(chain.bubbles[0].node_ids()) == [1, 2, 3, 4]


def test_ten_plus_chain_graph_end_to_end(tmp_path):
    """>=10 chains: the domain of the reference's 2-thread split, which
    indexes size_sorting.at(0..9) and *crashes* below 10 chains
    (src/polyassembly.cpp:193-205).  Here any chain count works and
    threads>1 stays deterministic; every chain phases."""
    import json
    import sys
    sys.path.insert(0, "tests")
    from util import simulate_multichain
    from ahsoka_tpu.pipeline import run_phase

    glines, gaf = simulate_multichain(num_chains=12, bubbles_per_chain=4,
                                      reads_per_hap=6, seed=1)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    cfg = PhasingConfig(backend="jax", debug_readset_files=False,
                        threads=2)
    run_phase(str(gfa), str(gaff), str(tmp_path / "o"), cfg)
    metrics = json.loads((tmp_path / "o-metrics.json").read_text())
    assert metrics["num_chains"] == 12
    assert metrics["chains_phased"] == 12
    assert metrics["chains_failed"] == 0
    # determinism across thread widths
    cfg1 = dataclasses.replace(cfg, threads=1)
    run_phase(str(gfa), str(gaff), str(tmp_path / "p"), cfg1)
    assert (tmp_path / "o-result.txt").read_bytes() == \
        (tmp_path / "p-result.txt").read_bytes()
