"""The native cluster-editing solvers must release the GIL so the
--threads host pool scales the clustering stage with cores (VERDICT r3
item 1b: core-count is the config4 lever for whatever CE work remains
after collapsing)."""

import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from ahsoka_tpu.cluster._native_ce import (cluster_editing_native,
                                           native_ce_available)


def _workload(seed):
    rng = np.random.default_rng(seed)
    n = 700
    hap = rng.integers(0, 2, size=n)
    w = np.where(hap[:, None] == hap[None, :], 1.0, -1.0)
    w += rng.normal(0, 0.3, size=(n, n))
    w = (w + w.T) / 2
    np.fill_diagonal(w, 0.0)
    return w


@pytest.mark.skipif(not native_ce_available(),
                    reason="no C++ toolchain")
@pytest.mark.skipif((os.cpu_count() or 1) < 2,
                    reason="needs >= 2 cores")
def test_native_ce_releases_gil_and_scales():
    w1, w2 = _workload(0), _workload(1)
    # warm (build the .so, fault in pages)
    cluster_editing_native(_workload(2), mode="whatshap")

    t0 = time.perf_counter()
    r1 = cluster_editing_native(w1.copy(), mode="whatshap")
    r2 = cluster_editing_native(w2.copy(), mode="whatshap")
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(cluster_editing_native, w1.copy(),
                         mode="whatshap")
        f2 = pool.submit(cluster_editing_native, w2.copy(),
                         mode="whatshap")
        p1, p2 = f1.result(), f2.result()
    parallel = time.perf_counter() - t0

    assert p1 == r1 and p2 == r2        # thread-safe, same results
    # a GIL-holding call would serialise: parallel ~= serial.  Generous
    # margin for a loaded 2-core box; a true overlap shows ~0.5-0.6x.
    assert parallel < 0.85 * serial, (
        f"no overlap: parallel {parallel:.2f}s vs serial {serial:.2f}s")
