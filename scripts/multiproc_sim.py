"""Two-process distributed execution of the full phase pipeline (CPU
simulation of a 2-host TPU slice; SURVEY.md §4 item 3).

Launches N jax.distributed processes on the CPU backend (gloo cross-
process collectives), each owning half of an 8-device global mesh.  The
device stages (sharded projection with its min-merge collective, the
chain-sharded threading DP) run over the GLOBAL mesh — real cross-process
collectives — while host stages replicate per process, exactly the
replicate-graph / shard-reads model of SURVEY.md §2c.  Every process
writes complete outputs; the script asserts all of them are byte-equal to
a single-process 8-local-device run, and reports device-stage wall-clock
for both layouts (the config-5 scaling stand-in, BASELINE.md).

Usage:
    python scripts/multiproc_sim.py [--workdir DIR] [--nproc 2]
    python scripts/multiproc_sim.py --child ...   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

try:
    import ahsoka_tpu  # noqa: F401
except ModuleNotFoundError as e:
    if e.name != "ahsoka_tpu":
        raise                      # a real missing dependency, not us
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEVICES = 8                       # global device count in every layout


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_child(args) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ahsoka_tpu.dist.mesh import initialize_distributed
    if args.nproc > 1:
        initialize_distributed(coordinator=f"localhost:{args.port}",
                               num_processes=args.nproc,
                               process_id=args.pid)
    assert len(jax.devices()) == _DEVICES, jax.devices()

    from ahsoka_tpu.config import PhasingConfig
    from ahsoka_tpu.pipeline import run_phase
    cfg = PhasingConfig(backend="jax", debug_readset_files=False,
                        data_shards=_DEVICES, chain_shards=_DEVICES)
    run_phase(args.gfa, args.gaf, args.outstem, cfg)
    return 0


def _gen_inputs(workdir: str):
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from util import simulate_multichain

    glines, gaf = simulate_multichain(num_chains=4, bubbles_per_chain=8,
                                      reads_per_hap=12, error_rate=0.05,
                                      seed=11)
    gfa = os.path.join(workdir, "g.gfa")
    with open(gfa, "w") as fh:
        fh.writelines(glines)
    gafs = []
    for tag in ("s", "p0", "p1"):
        # per-process GAF copy: the identities side file is written next
        # to the input, and concurrent processes must not race on it
        path = os.path.join(workdir, f"r_{tag}.gaf")
        with open(path, "w") as fh:
            fh.writelines(gaf)
        gafs.append(path)
    return gfa, gafs


def _spawn(pid: int, nproc: int, port: int, gfa: str, gaf: str,
           outstem: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--pid", str(pid), "--nproc", str(nproc), "--port", str(port),
         "--local-devices", str(_DEVICES // nproc),
         "--gfa", gfa, "--gaf", gaf, "--outstem", outstem],
        cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _stage_summary(outstem: str) -> dict:
    with open(f"{outstem}-metrics.json") as fh:
        m = json.load(fh)
    device = sum(sum(c["stage_seconds"].get(k, 0.0)
                     for k in ("projection", "threading"))
                 for c in m["chains"])
    # the phase timer starts after the device handshake (run_phase warms
    # up first), so no warmup subtraction is needed here
    return {"device_stage_seconds": round(device, 3),
            "phase_seconds": round(m["stage_seconds"]["phase"], 3),
            "chains_failed": m["chains_failed"]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=_DEVICES)
    ap.add_argument("--gfa")
    ap.add_argument("--gaf")
    ap.add_argument("--outstem")
    ap.add_argument("--workdir", default="/tmp/ahsoka_multiproc")
    args = ap.parse_args()
    if args.child:
        return run_child(args)

    workdir = args.workdir
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    gfa, (gaf_s, gaf_0, gaf_1) = _gen_inputs(workdir)

    # single-process golden: same global device count, one process
    t0 = time.perf_counter()
    p = _spawn(0, 1, 0, gfa, gaf_s, os.path.join(workdir, "single"))
    out, err = p.communicate(timeout=900)
    t_single = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(err[-2000:])
        return 1

    # two jax.distributed processes, 4 local devices each
    port = _free_port()
    t0 = time.perf_counter()
    procs = [_spawn(i, args.nproc, port, gfa, [gaf_0, gaf_1][i],
                    os.path.join(workdir, f"proc{i}"))
             for i in range(args.nproc)]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            sys.stderr.write(f"proc{i} failed:\n" + err[-2000:])
            return 1
    t_multi = time.perf_counter() - t0

    # every process must emit complete, byte-identical outputs
    def read(stem, suffix):
        with open(os.path.join(workdir, stem + suffix), "rb") as fh:
            return fh.read()

    mismatches = []
    suffixes = ["-result.txt", "-bubbleinfo.txt"] + sorted(
        f[len("single"):] for f in os.listdir(workdir)
        if f.startswith("single-chain") and f.endswith("-result.txt"))
    for suffix in suffixes:
        golden = read("single", suffix)
        for i in range(args.nproc):
            if read(f"proc{i}", suffix) != golden:
                mismatches.append((suffix, i))
    summary = {
        "nproc": args.nproc,
        "global_devices": _DEVICES,
        "files_compared": len(suffixes) * args.nproc,
        "byte_equal": not mismatches,
        "mismatches": mismatches,
        "single": _stage_summary(os.path.join(workdir, "single")),
        "multi": _stage_summary(os.path.join(workdir, "proc0")),
        "wall_seconds": {"single": round(t_single, 2),
                         "multi": round(t_multi, 2)},
    }
    print(json.dumps(summary))
    return 0 if not mismatches else 1


if __name__ == "__main__":
    sys.exit(main())
