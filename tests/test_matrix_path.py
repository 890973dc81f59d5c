"""Matrix-native readset path vs the object path (same winner tables)."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.device import (assemble_readsets,
                                       containment_key_tables,
                                       prepare_chain_inputs)
from ahsoka_tpu.project.matrix import (chain_matrix_from_keys,
                                       partial_sweep_from_stats)
from ahsoka_tpu.score.pairwise import readset_to_matrix

from test_device_parity import _sim_chain_inputs


@pytest.mark.parametrize("error_rate", [0.0, 0.08])
def test_matrix_path_equals_object_path(error_rate):
    cfg = PhasingConfig()
    bubble_paths, alignments = _sim_chain_inputs(error_rate)
    inputs = prepare_chain_inputs(bubble_paths, alignments)
    full_k, part_k, gate_k = containment_key_tables(inputs, cfg)

    # object path
    readsets = assemble_readsets(inputs, full_k, part_k, gate_k, cfg)
    obj_matrix = readset_to_matrix(readsets.partial_filtered)

    # matrix path
    sweep = partial_sweep_from_stats(inputs, full_k, cfg)
    cm = chain_matrix_from_keys(inputs, part_k, gate_k, sweep, cfg)

    assert cm.matrix.read_names == obj_matrix.read_names
    assert np.array_equal(cm.matrix.positions, obj_matrix.positions)
    assert np.array_equal(cm.matrix.alleles, obj_matrix.alleles)
    mapqs = [readsets.partial_filtered.get_by_name(n).mapq
             for n in obj_matrix.read_names]
    assert list(cm.mapq) == mapqs
