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
