"""Benchmark: haplotype-threading DP throughput on the TPU chip.

Prints ONE JSON line:
    {"metric": "dp_cells_per_s", "value": N, "unit": "cells/s",
     "vs_baseline": R, ...extras}

- "value": DP cells/s of the batched TPU threading DP (chains x positions x
  states x transition-states per BASELINE.md), steady-state, one chip.
- "vs_baseline": ratio against the native sequential C++ DP
  (native/dp_baseline.cpp — the reference-style single-core HaploThreader
  execution model) on this host, same workload per chain.
- extras: projection reads/s (containment matmul throughput) and raw
  numbers for the record.

Usage: python bench.py [--chains N] [--positions P] [--ploidy K] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_dp_workload(num_chains: int, P: int, ploidy: int, seed: int = 0):
    from ahsoka_tpu.thread.states import (full_state_counts,
                                          full_state_validity, num_states)

    rng = np.random.default_rng(seed)
    M = 2 * ploidy
    K_CLUSTERS = 3 * ploidy
    counts_table = full_state_counts(ploidy)
    valid_table = full_state_validity(ploidy)

    ncand = np.full((num_chains, P), M, dtype=np.int32)
    geno = np.zeros((num_chains, P, 2), dtype=np.float32)
    geno[..., 0] = (ploidy + 1) // 2
    geno[..., 1] = ploidy // 2
    # vectorised: M distinct candidate clusters per position via argsort of
    # random keys, sorted ascending like the covmap construction
    keys = rng.random((num_chains, P, K_CLUSTERS))
    cands = np.sort(np.argsort(keys, axis=-1)[..., :M]).astype(np.int32)
    w = rng.random((num_chains, P, M)).astype(np.float32) + 0.05
    cov = w / w.sum(axis=-1, keepdims=True)
    cons = rng.integers(0, 2, size=(num_chains, P, M)).astype(np.int32)
    return (cands, ncand, cov, cons, geno, counts_table, valid_table,
            num_states(M, ploidy))


def bench_dp_tpu(cands, ncand, cov, cons, geno, counts_table, valid_table,
                 S: int, ploidy: int, min_seconds: float = 2.0,
                 kernel: str = "xla"):
    import jax
    import jax.numpy as jnp
    from ahsoka_tpu.dist.step import batched_dp_forward

    num_chains, P, M = cands.shape
    args = [jnp.asarray(x) for x in
            (cands, ncand, cov, cons, geno, counts_table, valid_table)]

    if kernel == "pallas-stream":
        from ahsoka_tpu.thread.dp_pallas import (pad_chain_batch,
                                                 thread_batch_pallas_streamed)
        cands, ncand, cov, cons, geno, _ = pad_chain_batch(
            cands, ncand, cov, cons, geno)
        num_chains = cands.shape[0]
        args = [jnp.asarray(x) for x in
                (cands, ncand, cov, cons, geno, counts_table, valid_table)]

        def run(ca, nc, co, cs, ge, ct, vt):
            return thread_batch_pallas_streamed(
                ca, nc, co, cs, ge, ct, vt, ploidy=ploidy, num_alleles=2,
                switch_cost=32.0, affine_cost=8.0)
    elif kernel == "pallas":
        from ahsoka_tpu.thread.dp_pallas import (max_pallas_positions,
                                                 pad_chain_batch,
                                                 thread_batch_pallas)
        limit = max_pallas_positions(ploidy)
        if P > limit:
            raise SystemExit(
                f"--kernel pallas supports positions <= {limit} at "
                f"ploidy {ploidy} (VMEM-resident block); use --kernel "
                f"xla for longer chains")
        cands, ncand, cov, cons, geno, _ = pad_chain_batch(
            cands, ncand, cov, cons, geno)
        num_chains = cands.shape[0]
        args = [jnp.asarray(x) for x in
                (cands, ncand, cov, cons, geno, counts_table, valid_table)]

        def run(ca, nc, co, cs, ge, ct, vt):
            return thread_batch_pallas(
                ca, nc, co, cs, ge, ct, vt, ploidy=ploidy, num_alleles=2,
                switch_cost=32.0, affine_cost=8.0)
    else:
        @jax.jit
        def run(ca, nc, co, cs, ge, ct, vt):
            return batched_dp_forward(
                ca, nc, co, cs, ge, ct, vt, ploidy=ploidy, num_alleles=2,
                switch_cost=32.0, affine_cost=8.0, cov_w=1.0, geno_w=1.0)

    out = run(*args)
    jax.block_until_ready(out)          # compile + warmup
    iters, t0 = 0, time.perf_counter()
    while True:
        out = run(*args)
        jax.block_until_ready(out)
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= min_seconds and iters >= 3:
            break
    cells = num_chains * (P - 1) * S * S
    return cells * iters / dt, dt / iters


def bench_dp_native(cands, ncand, cov, cons, geno, ploidy: int,
                    max_chains: int = 8):
    from ahsoka_tpu.thread._native_dp import (native_dp_available,
                                              run_native_dp)

    if not native_dp_available():
        return None
    num_chains = min(cands.shape[0], max_chains)
    t0 = time.perf_counter()
    total_cells = 0
    for c in range(num_chains):
        res = run_native_dp(cands[c], ncand[c], cov[c], cons[c], geno[c],
                            ploidy, 32.0, 8.0)
        total_cells += res[0]
    dt = time.perf_counter() - t0
    return total_cells / dt


def bench_projection(seed: int = 0, min_seconds: float = 1.5):
    """Containment-matmul throughput in alignments/s (reads/s proxy)."""
    import jax
    import jax.numpy as jnp
    from ahsoka_tpu.project.device import containment_keys_core

    rng = np.random.default_rng(seed)
    B, APB, V, A, L, N, CHUNK = 512, 2, 2048, 1 << 15, 12, 1 << 13, 2048
    S = B * APB
    pf = np.zeros((S, V), dtype=np.int8)
    for s in range(S):
        pf[s, rng.choice(V, size=3, replace=False)] = 1
    pi = pf.copy()
    plf = pf.sum(axis=1).astype(np.int32)
    pli = plf.copy()
    pb = np.repeat(np.arange(B, dtype=np.int32), APB)
    pkb = np.tile((np.arange(APB, dtype=np.int32) << 23), B)
    nodes = rng.integers(0, V, size=(A, L), dtype=np.int32)
    name_id = rng.integers(0, N, size=A, dtype=np.int32)
    ident = rng.uniform(0.85, 1.0, size=A).astype(np.float32)

    fn = jax.jit(lambda *a: containment_keys_core(
        *a, num_bubbles=B, num_names=N, chunk=CHUNK))
    args = (jnp.asarray(pf), jnp.asarray(pi), jnp.asarray(plf),
            jnp.asarray(pli), jnp.asarray(pb), jnp.asarray(pkb),
            jnp.asarray(nodes), jnp.asarray(name_id), jnp.asarray(ident),
            jnp.float32(90.0))
    out = fn(*args)
    jax.block_until_ready(out)
    iters, t0 = 0, time.perf_counter()
    while True:
        out = fn(*args)
        jax.block_until_ready(out)
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= min_seconds and iters >= 3:
            break
    return A * iters / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--positions", type=int, default=1024)
    ap.add_argument("--ploidy", type=int, default=2)
    ap.add_argument("--kernel",
                    choices=["xla", "pallas", "pallas-stream"],
                    default="xla",
                    help="DP implementation: XLA scan (fastest at "
                         "scale) or the Pallas min-plus kernel")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.chains, args.positions = 32, 128

    (cands, ncand, cov, cons, geno, counts_table, valid_table,
     S) = make_dp_workload(args.chains, args.positions, args.ploidy)

    tpu_cells_per_s, step_s = bench_dp_tpu(
        cands, ncand, cov, cons, geno, counts_table, valid_table, S,
        args.ploidy, kernel=args.kernel)
    native_cells_per_s = bench_dp_native(cands, ncand, cov, cons, geno,
                                         args.ploidy)
    reads_per_s = bench_projection()

    vs = (tpu_cells_per_s / native_cells_per_s
          if native_cells_per_s else None)
    import jax
    print(json.dumps({
        "metric": "dp_cells_per_s",
        "value": round(tpu_cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "baseline_native_cells_per_s": round(native_cells_per_s, 1)
        if native_cells_per_s else None,
        "projection_reads_per_s": round(reads_per_s, 1),
        "dp_step_seconds": round(step_s, 6),
        "chains": args.chains, "positions": args.positions,
        "ploidy": args.ploidy, "kernel": args.kernel,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
