"""Profile the cluster-editing stage at config4-chain scale.

The round-3 verdict's top item: clustering is 550 CPU-s of config4's
442 s engine wall (~75%), and the dense whatshap-rule solver's cost grew
~O(n^3) between 1k and 4k reads.  This script measures, on a
config4-shaped single chain (50 bubbles, span-3 reads, 2% switch noise)
at several read counts:

  - dense native WH solver (the current product path) — wall seconds;
  - sparse native WH solver over the nonzero edge list (exact and
    approximate priorities);
  - sparse WH over |w|-pruned edge lists at several keep fractions;
  - for every variant: cluster ARI vs the dense result and planted-truth
    switch error / hamming after threading, so speed gains carry their
    accuracy cost.

Usage: python scripts/profile_ce.py [--reads 1000 2000 4000] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

try:
    import ahsoka_tpu  # noqa: F401
except ModuleNotFoundError as e:
    if e.name != "ahsoka_tpu":
        raise
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def chain_matrix(num_reads: int, bubbles: int, seed: int, config):
    """One config4-shaped chain -> (AlleleMatrix, scores, truth info)."""
    import tempfile

    from ahsoka_tpu.phase import ChainPhasingResult, _chain_matrix_stage
    from ahsoka_tpu.pipeline import prepare_phase_inputs
    from ahsoka_tpu.score.device import score_pairs_device
    from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic

    spec = SynthSpec(num_chains=1, bubbles_per_chain=bubbles,
                     reads_per_hap=num_reads // 2, span=3,
                     error_rate=0.02, seed=seed)
    with tempfile.TemporaryDirectory() as td:
        gfa, gaf = os.path.join(td, "g.gfa"), os.path.join(td, "g.gaf")
        write_synthetic(gfa, gaf, spec)
        art = prepare_phase_inputs(gfa, gaf, os.path.join(td, "o"),
                                   config, columnar=True)
        (size, cid), = art.size_sorting
        res = ChainPhasingResult(chain_id=cid, num_bubbles=size,
                                 skipped=True)
        matrix = _chain_matrix_stage(
            cid, art.allele_paths[cid], None, os.path.join(td, "o"),
            config, res, columns=art.gaf_columns,
            bucket=art.chain_buckets[cid])
    t0 = time.perf_counter()
    scores = score_pairs_device(matrix, config)
    t_score = time.perf_counter() - t0
    return matrix, scores, t_score


def edges_from_dense(scores: np.ndarray, keep_frac: float = 1.0):
    """Upper-triangle nonzero edges; keep the top |w| fraction."""
    iu = np.triu_indices(scores.shape[0], k=1)
    w = scores[iu]
    nz = w != 0
    eu, ev, ew = iu[0][nz], iu[1][nz], w[nz]
    if keep_frac < 1.0 and len(ew):
        k = max(int(len(ew) * keep_frac), 1)
        thresh = np.partition(np.abs(ew), len(ew) - k)[len(ew) - k]
        keep = np.abs(ew) >= thresh
        eu, ev, ew = eu[keep], ev[keep], ew[keep]
    return eu, ev, ew


def downstream(matrix, clusters, config):
    """clusters -> threaded haplotype branch calls vs planted truth
    (truth hap of read r is r's generator index parity-free: synth reads
    are emitted hap-major, so the first half of read NAMES is hap 0 —
    we instead score switch error of the threaded alleles against the
    planted alternating branch structure via the allele matrix)."""
    from ahsoka_tpu.cluster.editing import assignment_from_clusters
    from ahsoka_tpu.cluster.postprocess import (build_dp_inputs_from_matrix,
                                                consensus_lookup)
    from ahsoka_tpu.thread.dp_host import assign_rows
    from ahsoka_tpu.thread.dp_jax import thread_chain_device

    cluster_of = assignment_from_clusters(clusters, matrix.num_reads)
    dp = build_dp_inputs_from_matrix(matrix.alleles, matrix.positions,
                                     cluster_of, config)
    path = assign_rows(thread_chain_device(dp, config), config.ploidy)
    cons = consensus_lookup(dp)
    P = dp.num_positions
    k = config.ploidy
    haps = np.zeros((P, k), dtype=np.int64)
    for j in range(P):
        for i in range(k):
            haps[j, i] = cons[j].get(int(path[j][i]), -1)
    # planted truth: synth haplotype h takes allele-path h at every
    # bubble ONLY up to allele enumeration order; alleles are branch
    # order, so truth row is (0, 1) at every position
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from quantify_fastpaths import hap_divergence, switch_error
    truth = np.tile(np.arange(k), (P, 1))
    return cluster_of, switch_error(haps, truth), \
        hap_divergence(haps, truth)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, nargs="+",
                    default=[1000, 2000, 4000])
    ap.add_argument("--bubbles", type=int, default=50)
    ap.add_argument("--keep", type=float, nargs="+",
                    default=[1.0, 0.5, 0.25])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--skip-sparse", action="store_true",
                    help="skip the sparse-exact/approx variants (the "
                         "exact-priority refresh is superlinear; hours "
                         "at 8k+ reads)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from ahsoka_tpu.cluster._native_ce import (cluster_editing_native,
                                               cluster_editing_sparse)
    from ahsoka_tpu.config import PhasingConfig

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quantify_fastpaths import ari

    config = PhasingConfig(debug_readset_files=False)
    rows = []
    for R in args.reads:
        matrix, scores, t_score = chain_matrix(R, args.bubbles,
                                               args.seed, config)
        n = matrix.num_reads
        eu, ev, ew = edges_from_dense(scores)
        density = 2.0 * len(ew) / max(n * (n - 1), 1)
        print(f"# reads={n} bubbles={args.bubbles} nnz_edges={len(ew)} "
              f"density={density:.3f} score_s={t_score:.2f}",
              file=sys.stderr)

        variants = []
        if not args.skip_dense:
            variants.append(("dense", None, None))
        variants.append(("collapsed", None, None))
        if not args.skip_sparse:
            variants.append(("sparse-exact", 1.0, True))
            for kf in args.keep:
                variants.append((f"sparse-approx-k{kf}", kf, False))

        base_cl = None
        for name, kf, exact in variants:
            t0 = time.perf_counter()
            if name == "dense":
                clusters = cluster_editing_native(scores, mode="whatshap")
            elif name == "collapsed":
                # the product fast path: collapse identical rows, score
                # the distinct rows weighted, CE the weighted group
                # graph (includes its own scoring so the row reports the
                # full stage cost it replaces)
                from ahsoka_tpu.cluster.editing import cluster_editing
                from ahsoka_tpu.project.collapse import (collapse_reads,
                                                         expand_clusters)
                from ahsoka_tpu.score.device import score_pairs_device

                cm = collapse_reads(matrix)
                sg = score_pairs_device(cm.matrix, config, mult=cm.mult)
                w = sg * np.outer(cm.mult, cm.mult)
                np.fill_diagonal(w, 0.0)
                grp = cluster_editing(w, mode="whatshap")
                clusters = expand_clusters(grp, cm.inverse)
                print(f"#   collapsed: G={cm.num_groups} of R={n}",
                      file=sys.stderr)
            else:
                u2, v2, w2 = edges_from_dense(scores, kf)
                clusters = cluster_editing_sparse(
                    n, u2, v2, w2, exact_priorities=exact,
                    mode="whatshap")
            secs = time.perf_counter() - t0
            cl, sw, ham = downstream(matrix, clusters, config)
            if base_cl is None:
                base_cl = cl
            row = {"reads": n, "variant": name,
                   "ce_seconds": round(secs, 3),
                   "clusters": len(clusters),
                   "ari_vs_first": round(ari(cl, base_cl), 4),
                   "switch_err_vs_truth": round(sw, 4),
                   "hamming_vs_truth": round(ham, 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
