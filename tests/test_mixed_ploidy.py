"""Mixed-ploidy runs (config.ploidy_map): per-chain ploidy overrides
through the whole batched pipeline — DP-input construction, per-ploidy
threading groups, emission — the BASELINE config-5 shape.  The
reference pins ploidy globally (src/alignmentstoreadset.cpp:306)."""

import json

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig


def test_ploidy_map_validates_entries():
    with pytest.raises(ValueError, match="ploidy"):
        PhasingConfig(ploidy_map={0: 9})
    with pytest.raises(ValueError, match="dp_beam_width"):
        PhasingConfig(ploidy_map={0: 6})        # k=6 needs a beam
    cfg = PhasingConfig(ploidy_map={0: 4, 3: 2})
    assert cfg.ploidy_map == {0: 4, 3: 2}
    cfg6 = PhasingConfig(ploidy_map={1: 6}, dp_beam_width=512)
    assert cfg6.ploidy_map[1] == 6


def test_chain_config_override():
    from ahsoka_tpu.phase import chain_config

    cfg = PhasingConfig(ploidy=2, ploidy_map={7: 4})
    assert chain_config(cfg, 1) is cfg          # no override -> same
    c7 = chain_config(cfg, 7)
    assert c7.ploidy == 4 and c7.ploidy_map is None
    # non-ploidy fields carry over
    assert c7.switch_cost == cfg.switch_cost


def test_mixed_ploidy_e2e_recovers_both_chains(tmp_path):
    """One run phases a diploid and a tetraploid chain at their own
    ploidies (ploidy_map derived from the planted truth) and recovers
    every planted haplotype exactly."""
    from ahsoka_tpu.pipeline import prepare_phase_inputs, run_phase
    from ahsoka_tpu.utils.accuracy import (ploidy_map_from_truth,
                                           score_phased_output)
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    gfa, gaf = str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf")
    truth = str(tmp_path / "g.truth")
    out = str(tmp_path / "out")
    spec = SynthSpec(chain_plan=[(8, 2), (8, 4)], reads_per_hap=20,
                     span=4, error_rate=0.0)
    write_synthetic(gfa, gaf, spec, truth_path=truth)

    base = PhasingConfig(ploidy=2, genotype_prior="balanced",
                         debug_readset_files=False)
    art = prepare_phase_inputs(gfa, gaf, str(tmp_path / "probe"), base)
    pmap = ploidy_map_from_truth(art.allele_paths, truth)
    assert sorted(pmap.values()) == [2, 4]

    cfg = PhasingConfig(ploidy=2, ploidy_map=pmap,
                        genotype_prior="balanced",
                        debug_readset_files=False)
    run_phase(gfa, gaf, out, cfg)

    acc = score_phased_output(out, truth)
    assert acc["phased_bubble_frac"] == 1.0
    assert acc["switch_err_vs_truth"] == 0.0
    assert acc["hamming_vs_truth"] == 0.0

    # the tetraploid chain's result file carries 4 haplotype lines, the
    # diploid one 2
    with open(f"{out}-metrics.json") as fh:
        m = json.load(fh)
    line_counts = set()
    for c in m["chains"]:
        if c["skipped"]:
            continue
        with open(f"{out}-chain{c['chain_id']}-result.txt") as fh:
            line_counts.add(sum(1 for _ in fh))
    assert line_counts == {2, 4}


def test_mixed_ploidy_cli_ploidy_map(tmp_path):
    """--ploidy-map JSON reaches the engine through the CLI."""
    from ahsoka_tpu.cli.main import main
    from ahsoka_tpu.pipeline import prepare_phase_inputs
    from ahsoka_tpu.utils.accuracy import (ploidy_map_from_truth,
                                           score_phased_output)
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    gfa, gaf = str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf")
    truth = str(tmp_path / "g.truth")
    out = str(tmp_path / "out")
    spec = SynthSpec(chain_plan=[(6, 3), (6, 2)], reads_per_hap=20,
                     span=4, error_rate=0.0)
    write_synthetic(gfa, gaf, spec, truth_path=truth)
    art = prepare_phase_inputs(gfa, gaf, str(tmp_path / "probe"),
                               PhasingConfig(debug_readset_files=False))
    pmap = ploidy_map_from_truth(art.allele_paths, truth)
    pmap_path = str(tmp_path / "pmap.json")
    with open(pmap_path, "w") as fh:
        json.dump({str(c): k for c, k in pmap.items()}, fh)

    main(["phase", "-g", gfa, "-a", gaf, "-o", out,
          "--ploidy-map", pmap_path, "--genotype-prior", "balanced"])
    acc = score_phased_output(out, truth)
    assert acc["switch_err_vs_truth"] == 0.0
    assert acc["hamming_vs_truth"] == 0.0
