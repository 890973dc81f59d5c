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


def test_synth_hap_weights_skew_read_counts(tmp_path):
    """hap_weights plants uneven per-haplotype coverage (the fast-path
    divergence study's skewed regime)."""
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    spec = SynthSpec(num_chains=1, bubbles_per_chain=4, reads_per_hap=20,
                     span=2, hap_weights=(3.0, 1.0), seed=1)
    gfa, gaf = tmp_path / "g.gfa", tmp_path / "r.gaf"
    truth = tmp_path / "t.txt"
    write_synthetic(str(gfa), str(gaf), spec, truth_path=str(truth))
    lines = gaf.read_text().splitlines()
    assert len(lines) == 40           # total preserved
    # reads are emitted hap-by-hap; recover the split from the planted
    # truth branches: count reads whose first branch node is hap 0's
    branches = {}
    for line in truth.read_text().splitlines():
        c, h, nodes = line.split()
        branches[int(h)] = {f"utg{int(x):06d}l"
                            for x in nodes.split(",")}
    only0 = branches[0] - branches[1]
    n0 = sum(1 for ln in lines
             if any(seg in ln for seg in only0))
    assert n0 == 30                   # 3:1 of 40
