"""Roofline analysis of the flagship threading-DP kernels (VERDICT r4
item 2): what does 204 G cells/s *mean* against what the chip can do?

For each flagship program (the full batched threading path the product
dispatches: XLA node-cost pass + Pallas forward + Pallas/XLA backtrace)
this script:

1. counts the HBM bytes moved and VPU op-elements per chain-position
   analytically from the kernel array shapes (derivations below);
2. measures steady-state cells/s on the chip with bench.py's
   dependency-chained repeat harness (dispatch-latency-proof);
3. prints the implied GB/s and op/s next to the v5e peaks, the binding
   resource, and the achieved fraction of the roofline ceiling.

v5e peaks (public numbers, "How to Scale Your Model" / TPU docs):
HBM ~819 GB/s; VPU = 8x128 lanes x 4 ALUs x 940 MHz ~ 3.85 T op/s f32;
MXU 197 TFLOP/s bf16 (the GE-matmul inter build rides the MXU and is
never the binding resource at these shapes).

Byte accounting per chain-position (a "cell" is one (src-state,
dst-state) transition evaluation; diploid: 100 cells/chain-position,
tetraploid exact: 330^2 = 108,900):

  diploid superblock (ops/minplus_diploid.py), per chain-position:
    node-cost pass (XLA):  read cand+cov+cons+geno ~56 B, write node 40 B
    forward kernel:        read node 40 B + cand 16 B, write bp 40 B
    backtrace kernel:      read bp 40 B, write states 4 B
    total ~236 B -> 2.36 B/cell -> HBM ceiling ~347 G cells/s
  VPU: forward ~850 op-elements/chain-position (16 eq builds, ~30 ge1
    combines, 100 transition+compare+2x select) + backtrace ~30
    -> ~8.8 op/cell -> VPU ceiling ~437 G cells/s
  => binding resource: HBM (~347 G); both resources land in the same
     ~2x band, i.e. the formulation is balanced rather than lopsided.

  tetraploid streamed GE (ops/minplus_stream.py _stream_kernel_ge),
  per chain-position:
    node-cost pass: read ~1.4 KB (cov/cons/geno at M=8) write node 1.32 KB
    forward: read node 1.32 KB + cand 32 B, write bp 1.32 KB
    backtrace (XLA scan): read bp 1.32 KB, write 4 B
    total ~6.7 KB -> 0.062 B/cell -> HBM ceiling ~13.3 T cells/s
  VPU (fold: switches/trans/total/min/argmin ~6 op-elements per cell
    + mapped/ge build amortised) ~7 op/cell -> VPU ceiling ~550 G
  MXU (inter contraction S_pad x S x X=32 MACs per chain-position)
    ~0.066 MAC/cell... -> ceiling well above VPU's
  => binding resource: VPU (~550 G cells/s).

Usage:  python scripts/roofline.py [--quick]
Writes benchdata/roofline.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import (_dp_rep_factory, make_dp_workload, measure_rtt,  # noqa: E402
                   timed_seconds_per_call)

HBM_GBPS = 819e9
VPU_OPS = 8 * 128 * 4 * 0.94e9          # ~3.85e12 f32 op-elements/s


def analyze(name, *, chains, positions, ploidy, kernel,
            bytes_per_cp, ops_per_cp, cells_per_cp, rtt):
    """Measure one kernel and fold in the analytic roofline."""
    import jax.numpy as jnp
    from ahsoka_tpu.thread.dp_pallas import pad_chain_batch

    w = make_dp_workload(chains, positions, ploidy)
    cands, ncand, cov, cons, geno, ct, vt, S = w
    mult = 1024 if kernel == "pallas-diploid" else 128
    padded = pad_chain_batch(cands, ncand, cov, cons, geno,
                             multiple=mult)
    nchains = padded[0].shape[0]
    a = [jnp.asarray(x) for x in padded[:5]] + \
        [jnp.asarray(ct), jnp.asarray(vt)]
    sec = timed_seconds_per_call(_dp_rep_factory(a, ploidy, kernel), rtt)
    cp_per_s = nchains * (positions - 1) / sec
    cells_per_s = cp_per_s * cells_per_cp
    achieved_gbps = cp_per_s * bytes_per_cp
    achieved_ops = cp_per_s * ops_per_cp
    hbm_ceiling = HBM_GBPS / bytes_per_cp * cells_per_cp
    vpu_ceiling = VPU_OPS / ops_per_cp * cells_per_cp
    ceiling = min(hbm_ceiling, vpu_ceiling)
    return {
        "kernel": name,
        "chains": nchains, "positions": positions, "ploidy": ploidy,
        "cells_per_s": round(cells_per_s / 1e9, 1),
        "unit": "G cells/s",
        "bytes_per_cell": round(bytes_per_cp / cells_per_cp, 4),
        "ops_per_cell": round(ops_per_cp / cells_per_cp, 2),
        "achieved_hbm_gbps": round(achieved_gbps / 1e9, 1),
        "achieved_vpu_gops": round(achieved_ops / 1e9, 1),
        "hbm_frac": round(achieved_gbps / HBM_GBPS, 3),
        "vpu_frac": round(achieved_ops / VPU_OPS, 3),
        "hbm_ceiling_gcells": round(hbm_ceiling / 1e9, 1),
        "vpu_ceiling_gcells": round(vpu_ceiling / 1e9, 1),
        "binding_resource": ("HBM" if hbm_ceiling < vpu_ceiling
                             else "VPU"),
        "roofline_frac": round(cells_per_s / ceiling, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--positions", type=int, default=1024)
    args = ap.parse_args()
    if args.quick:
        args.chains, args.positions = 128, 128

    from ahsoka_tpu.utils.xla_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax

    rtt = measure_rtt()
    out = {"backend": jax.default_backend(),
           "hbm_peak_gbps": HBM_GBPS / 1e9,
           "vpu_peak_gops": VPU_OPS / 1e9,
           "rtt_seconds": round(rtt, 5),
           "kernels": []}

    # diploid superblock: S=10, M=4.  Bytes per chain-position:
    #   node pass r/w: 56 + 40; fwd: 40 + 16 in, 40 out; bt: 40 + 4
    out["kernels"].append(analyze(
        "diploid-superblock", chains=args.chains,
        positions=args.positions, ploidy=2, kernel="pallas-diploid",
        bytes_per_cp=236.0, ops_per_cp=880.0, cells_per_cp=100,
        rtt=rtt))

    # tetraploid streamed GE: S=330, M=8.
    #   node pass: ~1.4K + 1.32K; fwd: 1.32K + 32 in, 1.32K out;
    #   bt (XLA): 1.32K + 4
    tchains = 128
    tpos = min(args.positions, 1024)
    out["kernels"].append(analyze(
        "tetraploid-streamed", chains=tchains, positions=tpos,
        ploidy=4, kernel="pallas-stream",
        bytes_per_cp=6716.0, ops_per_cp=7.0 * 108900, cells_per_cp=108900,
        rtt=rtt))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "roofline.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
