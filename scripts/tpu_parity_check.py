"""Hardware parity of the REAL compiled Pallas kernels on the current
backend (run on the TPU; the pytest interpret-mode tests cover the same
kernels as CPU emulation).

Checks, with exact state equality against the on-device XLA scan (which
test_dp pins to the host oracle):

  1. diploid superblock kernel  (ops/minplus_diploid.py), 1024 x P
  2. diploid streaming kernel   (ops/minplus_stream.py),  128 x P
  3. tetraploid streaming kernel (the round-2 VMEM-OOM shape and a long
     P), 128 x 256 and 128 x 1024

Prints one JSON line: {"backend": ..., "checks": [...], "all_equal": b}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo root on path unconditionally: `bench` (the workload builder)
# lives there and is not part of the installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def xla_states(cands, ncand, cov, cons, geno, ct, vt, ploidy):
    import jax
    import jax.numpy as jnp
    from ahsoka_tpu.dist.step import batched_dp_forward
    from ahsoka_tpu.thread.dp_jax import _backtrace

    fs, bp = jax.jit(lambda *a: batched_dp_forward(
        *a, ploidy=ploidy, num_alleles=2, switch_cost=32.0,
        affine_cost=8.0, cov_w=1.0, geno_w=1.0))(
        jnp.asarray(cands), jnp.asarray(ncand),
        jnp.asarray(cov.astype(np.float32)), jnp.asarray(cons),
        jnp.asarray(geno), jnp.asarray(ct), jnp.asarray(vt))
    s0, tail = jax.jit(jax.vmap(_backtrace))(fs, bp)
    return np.concatenate([np.asarray(s0)[:, None], np.asarray(tail)],
                          axis=1)


def main() -> int:
    from ahsoka_tpu.utils.xla_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bench import make_dp_workload
    from ahsoka_tpu.thread.dp_pallas import (thread_batch_pallas_diploid,
                                             thread_batch_pallas_streamed)

    checks = []

    def run(label, kernel_fn, chains, P, ploidy):
        w = make_dp_workload(chains, P, ploidy, seed=chains + P)
        cands, ncand, cov, cons, geno, ct, vt, S = w
        t0 = time.time()
        st, _ = kernel_fn(
            jnp.asarray(cands), jnp.asarray(ncand), jnp.asarray(cov),
            jnp.asarray(cons), jnp.asarray(geno), jnp.asarray(ct),
            jnp.asarray(vt), ploidy=ploidy, num_alleles=2,
            switch_cost=32.0, affine_cost=8.0)
        st = np.asarray(st)
        kt = time.time() - t0
        ref = xla_states(cands, ncand, cov, cons, geno, ct, vt, ploidy)
        eq = bool(np.array_equal(st, ref))
        checks.append({"check": label, "chains": chains, "positions": P,
                       "ploidy": ploidy, "states_bit_equal": eq,
                       "kernel_seconds_incl_compile": round(kt, 1)})
        sys.stderr.write(f"{label}: equal={eq}\n")

    run("diploid-superblock", thread_batch_pallas_diploid, 1024, 128, 2)
    run("diploid-streamed", thread_batch_pallas_streamed, 128, 128, 2)
    run("tetraploid-streamed-256", thread_batch_pallas_streamed,
        128, 256, 4)
    run("tetraploid-streamed-1024", thread_batch_pallas_streamed,
        128, 1024, 4)

    out = {"backend": jax.default_backend(),
           "date": time.strftime("%Y-%m-%d"),
           "checks": checks,
           "all_equal": all(c["states_bit_equal"] for c in checks)}
    print(json.dumps(out))
    return 0 if out["all_equal"] else 1


if __name__ == "__main__":
    sys.exit(main())
