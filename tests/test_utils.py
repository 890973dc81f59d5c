"""Utility parity: edit distance, canonical k-mers, plot script stats."""

from ahsoka_tpu.utils.editdist import edit_distance
from ahsoka_tpu.utils.kmers import (canonical_kmers, kmer_counts,
                                    reverse_complement)


def test_edit_distance():
    assert edit_distance("", "") == 0
    assert edit_distance("ACGT", "ACGT") == 0
    assert edit_distance("ACGT", "AGT") == 1
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "ACG") == 3
    assert edit_distance([1, 2, 3], [1, 3]) == 1


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAACCC") == "GGGTTT"


def test_canonical_kmers():
    # canonical = min(kmer, revcomp)
    # CGT's revcomp ACG is lexicographically smaller
    assert list(canonical_kmers("ACGTA", 3)) == ["ACG", "ACG", "GTA"]
    # TTT's revcomp AAA is smaller
    assert list(canonical_kmers("TTT", 3)) == ["AAA"]
    # N resets the window
    assert list(canonical_kmers("ACNGT", 2)) == ["AC", "AC"]


def test_kmer_counts():
    counts = kmer_counts("AAAA", 2)
    assert counts == {"AA": 3}


def test_plot_script_stats(tmp_path, capsys):
    import sys
    sys.path.insert(0, "scripts")
    import plot_bubbles
    info = tmp_path / "x-bubbleinfo.txt"
    info.write_text("chain id: 0size: 3\nbubble id: 0\nnode id: 1,2,\n"
                    "chain id: 1size: 7\n")
    assert plot_bubbles.main([str(info)]) == 0
    out = capsys.readouterr().out
    assert "chains: 2" in out
    assert "bubbles total: 10" in out
