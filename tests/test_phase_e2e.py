"""End-to-end diploid phase on a simulated bubble chain (host backend)."""

import re

import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_phase

from util import simulate_diploid


def _write_inputs(tmp_path, glines, gaf):
    gfa = tmp_path / "sim.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "sim.gaf"
    gaff.write_text("".join(gaf))
    return str(gfa), str(gaff)


def _parse_result(path):
    """-> {chain_id: [hap0 nodes, hap1 nodes, ...]} from -result.txt."""
    chains = {}
    current = None
    for line in open(path):
        m = re.match(r"chain id: (\d+)", line)
        if m:
            current = int(m.group(1))
            chains[current] = []
        elif line.startswith("haplotype"):
            chains[current].append([])
        elif current is not None and chains[current] and "(" in line:
            nodes = [int(x) for x in re.findall(r"(\d+)\([+-]\)", line)]
            chains[current][-1] = nodes
    return chains


@pytest.mark.parametrize("error_rate", [0.0, 0.05])
def test_diploid_phase_recovers_haplotypes(tmp_path, error_rate):
    glines, gaf, hapA, hapB = simulate_diploid(
        num_bubbles=6, reads_per_hap=10, span=3, error_rate=error_rate)
    gfa_path, gaf_path = _write_inputs(tmp_path, glines, gaf)
    out = str(tmp_path / "out")
    cfg = PhasingConfig(backend="host")
    run_phase(gfa_path, gaf_path, out, cfg)

    chains = _parse_result(out + "-result.txt")
    assert len(chains) == 1
    haps = chains[next(iter(chains))]
    assert len(haps) == 2
    setA, setB = set(hapA), set(hapB)
    got0, got1 = set(haps[0]), set(haps[1])
    # each output haplotype contains exactly one branch set (plus anchors)
    b0, b1 = got0 & (setA | setB), got1 & (setA | setB)
    assert {frozenset(b0), frozenset(b1)} == {frozenset(setA),
                                              frozenset(setB)}, (
        f"hap0 branches {sorted(b0)}, hap1 branches {sorted(b1)}")


def test_phase_writes_all_output_files(tmp_path):
    glines, gaf, _, _ = simulate_diploid(num_bubbles=4, reads_per_hap=6)
    gfa_path, gaf_path = _write_inputs(tmp_path, glines, gaf)
    out = str(tmp_path / "out")
    run_phase(gfa_path, gaf_path, out, PhasingConfig(backend="host"))
    produced = {p.name for p in tmp_path.iterdir()}
    assert "out-bubbleinfo.txt" in produced
    assert "out-result.txt" in produced
    assert "sim-alignment_identities.txt" in produced
    assert any(re.match(r"out-chain\d+-result\.txt", n) for n in produced)
    assert any(re.match(r"out-chain\d+-readset\.txt", n) for n in produced)
    assert any(re.match(r"out-chain\d+-readset_final\.txt", n)
               for n in produced)


def test_aggregate_headers_for_skipped_chains(tmp_path):
    # a graph with a one-bubble chain: headers written, phasing skipped
    from util import bubble_chain_gfa, gaf_line
    glines = bubble_chain_gfa(1)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text(gaf_line("r0", [(1, "+"), (2, "+"), (4, "+")], 0.99))
    out = str(tmp_path / "o")
    run_phase(str(gfa), str(gaff), out, PhasingConfig(backend="host"))
    text = open(out + "-result.txt").read()
    assert "chain id: 0\n" in text
    assert "size of chain: 1\n" in text
    assert "haplotype" not in text


def test_backends_agree_with_debug_files(tmp_path):
    """host vs jax with the readset debug dumps on: identical result and
    identical debug files (the object assembly is shared)."""
    glines, gaf, _, _ = simulate_diploid(num_bubbles=4, reads_per_hap=6)
    (tmp_path / "g.gfa").write_text("".join(glines))
    (tmp_path / "r.gaf").write_text("".join(gaf))
    cfg_h = PhasingConfig(backend="host", debug_readset_files=True)
    cfg_j = PhasingConfig(backend="jax", debug_readset_files=True)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "h"), cfg_h)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "j"), cfg_j)
    for suffix in ("-result.txt",):
        assert (tmp_path / f"h{suffix}").read_text() == \
            (tmp_path / f"j{suffix}").read_text()
    import glob
    h_files = sorted(glob.glob(str(tmp_path / "h-chain*-readset.txt")))
    assert h_files
    for hf in h_files:
        jf = hf.replace("/h-chain", "/j-chain")
        assert open(hf).read() == open(jf).read()


def test_dedup_bucketing_flag(tmp_path):
    """compat_duplicate_bucketing=False dedups chain buckets but phases
    the same haplotypes."""
    import dataclasses
    glines, gaf, hapA, hapB = simulate_diploid(num_bubbles=5,
                                               reads_per_hap=8)
    (tmp_path / "g.gfa").write_text("".join(glines))
    (tmp_path / "r.gaf").write_text("".join(gaf))
    cfg = dataclasses.replace(PhasingConfig(backend="host"),
                              compat_duplicate_bucketing=False)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "d"), cfg)
    chains = _parse_result(str(tmp_path / "d-result.txt"))
    haps = chains[next(iter(chains))]
    sets = {frozenset(set(h) & (set(hapA) | set(hapB))) for h in haps}
    assert sets == {frozenset(hapA), frozenset(hapB)}


def test_triploid_end_to_end(tmp_path):
    from util import simulate_polyploid
    glines, gaf, haps = simulate_polyploid(ploidy=3, num_bubbles=4,
                                           reads_per_hap=8)
    (tmp_path / "g.gfa").write_text("".join(glines))
    (tmp_path / "r.gaf").write_text("".join(gaf))
    cfg = PhasingConfig(ploidy=3, backend="host", use_genotypes=False)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "t"), cfg)
    chains = _parse_result(str(tmp_path / "t-result.txt"))
    out_haps = chains[next(iter(chains))]
    assert len(out_haps) == 3


def test_batched_dp_equals_sequential(tmp_path):
    """Batched multi-chain DP driver == per-chain driver, byte-for-byte."""
    import dataclasses
    from util import simulate_multichain
    glines, gaf = simulate_multichain(num_chains=5, bubbles_per_chain=7,
                                      reads_per_hap=10, error_rate=0.04)
    (tmp_path / "g.gfa").write_text("".join(glines))
    (tmp_path / "r.gaf").write_text("".join(gaf))
    base = PhasingConfig(backend="jax", debug_readset_files=False)
    cfg_b = dataclasses.replace(base, batch_dp=True)
    cfg_s = dataclasses.replace(base, batch_dp=False)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "b"), cfg_b)
    run_phase(str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf"),
              str(tmp_path / "s"), cfg_s)
    assert (tmp_path / "b-result.txt").read_text() == \
        (tmp_path / "s-result.txt").read_text()
    import glob
    b_files = sorted(glob.glob(str(tmp_path / "b-chain*-result.txt")))
    assert len(b_files) == 5
    for bf in b_files:
        sf = bf.replace("/b-chain", "/s-chain")
        assert open(bf).read() == open(sf).read()


def test_threaded_pass1_identical_output(tmp_path):
    """config.threads > 1 fans pass-1 over host workers; outputs must be
    byte-identical to the single-threaded driver (deterministic order)."""
    import dataclasses
    from util import simulate_multichain
    from ahsoka_tpu.config import PhasingConfig
    from ahsoka_tpu.pipeline import run_phase

    glines, gaf = simulate_multichain(num_chains=4, bubbles_per_chain=6,
                                      reads_per_hap=6, seed=3)
    g = tmp_path / "m.gfa"
    a = tmp_path / "m.gaf"
    g.write_text("".join(glines))
    a.write_text("".join(gaf))

    outs = []
    for threads in (1, 3):
        stem = tmp_path / f"out_t{threads}"
        cfg = dataclasses.replace(PhasingConfig(), threads=threads)
        run_phase(str(g), str(a), str(stem), cfg, backend="jax")
        outs.append((stem.parent / (stem.name + "-result.txt")).read_text())
    assert outs[0] == outs[1]
