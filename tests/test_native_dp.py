"""Native C++ sequential DP must match the Python oracle."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.thread._native_dp import native_dp_available, run_native_dp
from ahsoka_tpu.thread.dp_host import thread_chain
from ahsoka_tpu.thread.states import state_tuples

from test_dp import random_dp_inputs


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("ploidy", [2, 3, 4])
def test_native_dp_matches_oracle(seed, ploidy):
    if not native_dp_available():
        pytest.skip("native DP unavailable (no C++ toolchain)")
    cfg = PhasingConfig(ploidy=ploidy)
    dp = random_dp_inputs(P=10, ploidy=ploidy, num_clusters=2 * ploidy + 1,
                          seed=seed)
    res = run_native_dp(dp.candidates, dp.num_candidates, dp.coverage,
                        dp.consensus, dp.genotypes.astype(np.float32),
                        ploidy, cfg.switch_cost, cfg.affine_switch_cost)
    assert res is not None
    cells, states = res
    assert cells > 0
    tuples = state_tuples(2 * ploidy, ploidy)
    native_path = []
    for j, s in enumerate(states):
        slots = tuples[int(s)]
        native_path.append(
            tuple(int(dp.candidates[j, slot]) for slot in slots))
    host_path = thread_chain(dp, cfg)
    assert [sorted(t) for t in native_path] == \
        [sorted(t) for t in host_path]
