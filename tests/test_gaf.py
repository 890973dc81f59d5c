"""GAF parser tests: python parser semantics + native parser parity."""

import io
import time

import pytest

from ahsoka_tpu.graph.bubbles import find_bubbles
from ahsoka_tpu.io.gaf import (GafParseError, identities_sidefile_path,
                               parse_gaf_line, read_gaf)
from ahsoka_tpu.io.gfa import parse_gfa

from util import gaf_line, gfa_lines, simulate_diploid


def _index():
    lines = gfa_lines(7, [(1, "+", 2, "+"), (1, "+", 3, "+"),
                          (2, "+", 4, "+"), (3, "+", 4, "+"),
                          (4, "+", 5, "+"), (4, "+", 6, "+"),
                          (5, "+", 7, "+"), (6, "+", 7, "+")])
    return find_bubbles(parse_gfa(lines))


def test_parse_line_extracts_fields():
    line = gaf_line("readX", [(1, "+"), (2, "-"), (4, "+")], 0.987,
                    start=10, end=90)
    aln, names, blocklen = parse_gaf_line(line)
    assert aln.name == "readX"
    assert aln.node_ids == [1, 2, 4]
    assert aln.node_plus == [True, False, True]
    assert (aln.start, aln.end) == (10, 90)
    assert aln.identity == pytest.approx(0.987)
    assert names == ["utg000001l", "utg000002l", "utg000004l"]


def test_duplicate_bucketing_per_node():
    index = _index()
    line = gaf_line("r", [(1, "+"), (2, "+"), (4, "+")], 0.99)
    table = read_gaf([line], index, compat_duplicate_bucketing=True)
    # 3 path nodes in the same chain -> 3 duplicate bucket entries
    chain = index.chain_of_node(1)
    assert len(table.chain_alignments(chain)) == 3
    table2 = read_gaf([line], index, compat_duplicate_bucketing=False)
    assert len(table2.chain_alignments(chain)) == 1


def test_off_chain_nodes_bucket_to_chain_zero():
    index = _index()
    # node 99 is not in the graph -> chain id defaults to 0
    line = gaf_line("r", [(99, "+")], 0.9)
    table = read_gaf([line], index)
    assert len(table.chain_alignments(0)) == 1


def test_identities_sidefile_format():
    index = _index()
    out = io.StringIO()
    line = gaf_line("r1", [(1, "+"), (3, "-")], 0.95)
    read_gaf([line], index, identities_out=out)
    assert out.getvalue() == \
        "r1\t0.95\tutg000001l,utg000003l,\t1000\n"


def test_sidefile_path():
    assert identities_sidefile_path("/x/y.gaf") == \
        "/x/y-alignment_identities.txt"
    assert identities_sidefile_path("/x/reads.gaf.sorted") == \
        "/x/reads-alignment_identities.txt"


def test_native_parser_matches_python(tmp_path):
    from ahsoka_tpu.io._native_io import native_io_available
    if not native_io_available():
        pytest.skip("native io unavailable")
    glines, gaf, _, _ = simulate_diploid(num_bubbles=6, reads_per_hap=12,
                                         error_rate=0.05)
    index = find_bubbles(parse_gfa(glines))
    gaf_p = tmp_path / "r.gaf"
    gaf_p.write_text("".join(gaf))

    side_py, side_nat = io.StringIO(), io.StringIO()
    py = read_gaf(str(gaf_p), index, identities_out=side_py,
                  engine="python")
    nat = read_gaf(str(gaf_p), index, identities_out=side_nat,
                   engine="native")
    assert side_py.getvalue() == side_nat.getvalue()
    assert set(py.by_chain) == set(nat.by_chain)
    for chain in py.by_chain:
        a, b = py.by_chain[chain], nat.by_chain[chain]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x.name, x.node_ids, x.node_plus, x.start, x.end) == \
                (y.name, y.node_ids, y.node_plus, y.start, y.end)
            assert x.identity == pytest.approx(y.identity, rel=1e-6)
