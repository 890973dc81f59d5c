"""Budget-sliced batched scoring (phase.py): a whole-genome ragged run
cannot hold every chain's [G, G] float64 score matrix at once (~100 GB
at config5's 3000-chain shape), so the phase driver scores dense chains
in slices cut by ``score_fetch_budget_bytes`` and lets each slice's
cluster stage free its matrices before the next slice fetches.  The
slicing must be invisible in the output: byte-equal results at any
budget."""

import os

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_phase
from ahsoka_tpu.utils.synth import SynthSpec, write_synthetic


def _inputs(tmp_path):
    gfa = str(tmp_path / "g.gfa")
    gaf = str(tmp_path / "r.gaf")
    # ragged chain plan: the slice cutter must handle unequal G^2 costs
    spec = SynthSpec(chain_plan=[(6, 2), (14, 2), (9, 2), (20, 2),
                                 (11, 2)],
                     reads_per_hap=30, span=3, error_rate=0.02, seed=3)
    write_synthetic(gfa, gaf, spec)
    return gfa, gaf


def test_sliced_scoring_byte_equal(tmp_path):
    gfa, gaf = _inputs(tmp_path)
    outs = {}
    for name, budget in [("one", 64 << 30), ("many", 1024)]:
        stem = str(tmp_path / name)
        run_phase(gfa, gaf, stem,
                  config=PhasingConfig(debug_readset_files=False,
                                       score_fetch_budget_bytes=budget))
        with open(f"{stem}-result.txt") as fh:
            outs[name] = fh.read()
        assert os.path.exists(f"{stem}-metrics.json")
    # a 1 KB budget forces one slice per chain; output must not move
    assert outs["one"] == outs["many"]


def test_budget_floor_is_safe(tmp_path):
    """Degenerate budgets (0, negative) still phase every chain: the
    driver clamps to a 1 MiB floor rather than emitting empty slices."""
    gfa, gaf = _inputs(tmp_path)
    stem = str(tmp_path / "zero")
    run_phase(gfa, gaf, stem,
              config=PhasingConfig(debug_readset_files=False,
                                   score_fetch_budget_bytes=0))
    with open(f"{stem}-metrics.json") as fh:
        import json
        m = json.load(fh)
    assert m["chains_failed"] == 0
    assert m["chains_phased"] >= 5
