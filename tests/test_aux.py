"""Auxiliary subsystems: metrics, resume, keep-going."""

import json

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_phase

from util import simulate_diploid


def _inputs(tmp_path):
    glines, gaf, _, _ = simulate_diploid(num_bubbles=5, reads_per_hap=8)
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(glines))
    gaff = tmp_path / "r.gaf"
    gaff.write_text("".join(gaf))
    return str(gfa), str(gaff)


def test_metrics_file(tmp_path):
    gfa, gaf = _inputs(tmp_path)
    out = str(tmp_path / "o")
    run_phase(gfa, gaf, out, PhasingConfig(backend="host"))
    metrics = json.load(open(out + "-metrics.json"))
    assert metrics["chains_phased"] == 1
    assert metrics["total_dp_cells"] > 0
    assert metrics["reads_per_s"] > 0
    assert "phase" in metrics["stage_seconds"]
    assert metrics["chains"][0]["reads"] > 0


def test_resume_reuses_chain_results(tmp_path):
    gfa, gaf = _inputs(tmp_path)
    out = str(tmp_path / "o")
    run_phase(gfa, gaf, out, PhasingConfig(backend="host"))
    first = open(out + "-result.txt").read()
    # rerun with resume: chain result must be loaded, aggregate identical
    run_phase(gfa, gaf, out, PhasingConfig(backend="host"), resume=True)
    second = open(out + "-result.txt").read()
    assert first == second
    metrics = json.load(open(out + "-metrics.json"))
    assert metrics["chains"][0]["resumed"] is True


def test_keep_going_records_failure(tmp_path, monkeypatch):
    gfa, gaf = _inputs(tmp_path)
    out = str(tmp_path / "o")

    import ahsoka_tpu.phase as phase_mod

    def boom(*a, **k):
        raise RuntimeError("injected fault")

    monkeypatch.setattr(phase_mod, "phase_one_chain", boom)
    run_phase(gfa, gaf, out, PhasingConfig(backend="host"),
              keep_going=True)
    metrics = json.load(open(out + "-metrics.json"))
    assert metrics["chains_failed"] == 1
    assert "injected fault" in metrics["chains"][0]["error"]


def test_merge_aggregate_matches_single_process_writer(tmp_path):
    """merge_aggregate_result (chain-sharded rank-0 merge) must emit the
    aggregate byte-for-byte like the in-loop single-process writer:
    headers for every chain in size-sorted order, haplotype sections for
    chains with result files, header-only for skipped/failed chains."""
    from ahsoka_tpu.phase import merge_aggregate_result

    out = str(tmp_path / "m")
    # chain 7: two haplotype lines; chain 3: skipped (no file)
    with open(f"{out}-chain7-result.txt", "w") as fh:
        fh.write("1(+),2(+),\n")
        fh.write("1(+),3(-),\n")
    with open(f"{out}-chain1-result.txt", "w") as fh:
        fh.write("9(+),\n")
    size_sorting = [(5, 7), (4, 3), (2, 1)]
    merge_aggregate_result(out, size_sorting)
    expected = ("chain id: 7\nsize of chain: 5\n"
                "haplotype 0:\n1(+),2(+),\n"
                "haplotype 1:\n1(+),3(-),\n"
                "chain id: 3\nsize of chain: 4\n"
                "chain id: 1\nsize of chain: 2\n"
                "haplotype 0:\n9(+),\n")
    assert open(f"{out}-result.txt").read() == expected


def test_substage_attribution_covers_every_stage(tmp_path):
    """Every pipeline stage self-attributes in -metrics.json
    (stage_seconds.substages): projection, scoring, matrix, clustering,
    threading (VERDICT r4 stretch item 9).  Collapse is a single timed
    per-chain mark, asserted separately."""
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    gfa, gaf = str(tmp_path / "g.gfa"), str(tmp_path / "r.gaf")
    write_synthetic(gfa, gaf,
                    SynthSpec(num_chains=3, bubbles_per_chain=12,
                              reads_per_hap=30, span=4, error_rate=0.02))
    out = str(tmp_path / "o")
    run_phase(gfa, gaf, out,
              PhasingConfig(debug_readset_files=False))
    metrics = json.load(open(out + "-metrics.json"))
    sub = metrics["stage_seconds"]["substages"]
    for stage in ("projection", "scoring", "matrix", "clustering",
                  "threading"):
        assert any(k.startswith(stage + ".") for k in sub), (
            f"stage {stage} has no substage attribution: {sorted(sub)}")
    # fetch round trips are countable against the RTT estimate
    assert "projection.fetch_calls" in sub
    assert "device_rtt_est" in metrics["stage_seconds"]
