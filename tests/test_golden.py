"""Golden regression tests: committed input/output pairs pin the exact
byte-level behavior of the whole pipeline (both backends) across
refactors.  Regenerate deliberately with tests/data/README if semantics
are intentionally changed."""

import os
import shutil

import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.pipeline import run_only_bubbles, run_phase

DATA = os.path.join(os.path.dirname(__file__), "data")


def _golden(name):
    return open(os.path.join(DATA, name)).read()


@pytest.mark.parametrize("backend", ["host", "jax"])
def test_golden_diploid(tmp_path, backend):
    gaf = tmp_path / "golden_diploid.gaf"
    shutil.copy(os.path.join(DATA, "golden_diploid.gaf"), gaf)
    out = str(tmp_path / "o")
    run_phase(os.path.join(DATA, "golden_diploid.gfa"), str(gaf), out,
              PhasingConfig(backend=backend))
    assert open(out + "-result.txt").read() == \
        _golden("golden_diploid-result.txt")
    assert open(out + "-bubbleinfo.txt").read() == \
        _golden("golden_diploid-bubbleinfo.txt")
    assert open(str(tmp_path / "golden_diploid-alignment_identities.txt")
                ).read() == _golden("golden_diploid-identities.txt")


@pytest.mark.parametrize("backend", ["host", "jax"])
def test_golden_tetraploid(tmp_path, backend):
    gaf = tmp_path / "golden_tetra.gaf"
    shutil.copy(os.path.join(DATA, "golden_tetra.gaf"), gaf)
    out = str(tmp_path / "o")
    run_phase(os.path.join(DATA, "golden_tetra.gfa"), str(gaf), out,
              PhasingConfig(ploidy=4, backend=backend,
                            use_genotypes=False))
    assert open(out + "-result.txt").read() == \
        _golden("golden_tetra-result.txt")


def test_golden_only_bubbles(tmp_path):
    out = str(tmp_path / "b")
    run_only_bubbles(os.path.join(DATA, "golden_diploid.gfa"), out)
    assert open(out + "-bubbleinfo.txt").read() == \
        _golden("golden_diploid-bubbleinfo.txt")
