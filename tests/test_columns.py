"""Columnar GAF path vs the object path: same buckets, same readsets."""

import numpy as np
import pytest

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.graph.bubbles import find_bubbles
from ahsoka_tpu.io.columns import (bucket_by_chain,
                                   columns_from_alignments,
                                   read_gaf_columns)
from ahsoka_tpu.io.gaf import read_gaf
from ahsoka_tpu.io.gfa import parse_gfa
from ahsoka_tpu.pipeline import prepare_phase_inputs
from ahsoka_tpu.project.device import (assemble_readsets,
                                       containment_key_tables,
                                       prepare_chain_inputs,
                                       prepare_chain_inputs_from_columns)

from util import simulate_diploid
from test_device_parity import _readsets_equal


def _setup(tmp_path, error_rate=0.05):
    glines, gaf, _, _ = simulate_diploid(num_bubbles=6, reads_per_hap=10,
                                         error_rate=error_rate)
    gfa_p, gaf_p = tmp_path / "g.gfa", tmp_path / "r.gaf"
    gfa_p.write_text("".join(glines))
    gaf_p.write_text("".join(gaf))
    index = find_bubbles(parse_gfa(str(gfa_p)))
    return str(gfa_p), str(gaf_p), index


def test_bucketing_matches_object_path(tmp_path):
    _, gaf_p, index = _setup(tmp_path)
    cols = read_gaf_columns(gaf_p)
    if cols is None:
        pytest.skip("native io unavailable")
    buckets = bucket_by_chain(cols, index)
    table = read_gaf(gaf_p, index, engine="python")
    assert set(buckets) == set(table.by_chain)
    for chain, bucket in buckets.items():
        objs = table.by_chain[chain]
        assert len(bucket.record_idx) == len(objs)
        for rec, aln in zip(bucket.record_idx, objs):
            assert cols.names[int(cols.record_name[rec])] == aln.name
            lo, hi = cols.path_offsets[rec], cols.path_offsets[rec + 1]
            assert [int(x) for x in cols.node_ids[lo:hi]] == aln.node_ids


def test_columns_inputs_produce_equal_readsets(tmp_path):
    cfg = PhasingConfig()
    gfa_p, gaf_p, index = _setup(tmp_path)
    art = prepare_phase_inputs(gfa_p, gaf_p, str(tmp_path / "o"), cfg)
    chain_id = art.size_sorting[0][1]
    bubble_paths = art.allele_paths[chain_id]
    objs = art.alignments.chain_alignments(chain_id)

    cols = read_gaf_columns(gaf_p)
    if cols is None:
        cols = columns_from_alignments(
            sorted({a.order: a for a in objs}.values(),
                   key=lambda a: a.order))
    buckets = bucket_by_chain(cols, index)

    obj_inputs = prepare_chain_inputs(bubble_paths, objs)
    col_inputs = prepare_chain_inputs_from_columns(
        bubble_paths, cols, buckets[chain_id])
    # the columnar path dedups the reference's per-node duplicate bucket
    # entries (redundant for containment); identities must match on the
    # unique records, and the readsets below must be identical
    uniq = sorted({a.order: i for i, a in
                   reversed(list(enumerate(objs)))}.values())
    assert np.array_equal(obj_inputs.aln_identity[uniq],
                          col_inputs.aln_identity)

    obj_keys = containment_key_tables(obj_inputs, cfg)
    col_keys = containment_key_tables(col_inputs, cfg)
    obj_rs = assemble_readsets(obj_inputs, *obj_keys, cfg)
    col_rs = assemble_readsets(col_inputs, *col_keys, cfg)
    _readsets_equal(obj_rs.partial_filtered, col_rs.partial_filtered)
    _readsets_equal(obj_rs.full, col_rs.full)


def test_columnar_pipeline_end_to_end(tmp_path):
    """run_phase with columnar GAF path == object path, byte-for-byte."""
    from ahsoka_tpu.pipeline import run_phase
    import dataclasses
    gfa_p, gaf_p, _ = _setup(tmp_path, error_rate=0.05)
    cfg = PhasingConfig(backend="jax", debug_readset_files=False)
    run_phase(gfa_p, gaf_p, str(tmp_path / "col"), cfg, columnar=True)
    run_phase(gfa_p, gaf_p, str(tmp_path / "obj"), cfg, columnar=False)
    assert (tmp_path / "col-result.txt").read_text() == \
        (tmp_path / "obj-result.txt").read_text()
    # identities side file from the native writer matches the python one
    side = gaf_p.replace(".gaf", "-alignment_identities.txt")
    col_side = open(side).read()
    run_phase(gfa_p, gaf_p, str(tmp_path / "obj2"), cfg, columnar=False)
    assert open(side).read() == col_side
