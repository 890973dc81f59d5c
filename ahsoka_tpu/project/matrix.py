"""Matrix-native readset construction.

Builds the dense (reads x positions) allele matrix *directly* from the
projection winner tables ([bubbles, names] packed keys, project/device.py)
with vectorised numpy — no per-read Python objects on the hot path.  This
is the scalable equivalent of

    readset_to_matrix(assemble_readsets(...).partial_filtered)

and is parity-tested against that object path.  The object path remains the
semantics oracle and the debug-file writer.

Semantics reproduced (src/alignmentstoreadset.cpp:174-304):
- read creation at the first (position, allele, alignment) partial match;
  mapq = int(identity * 100) of the creating alignment
- later positions use the first *gated* match (identity*100 > 90)
- filter: >= 2 variants and mapq >= 93
- readset order: creation order, then stable-sorted by first position
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ahsoka_tpu.config import PhasingConfig
from ahsoka_tpu.project.device import (NO_MATCH, ChainDeviceInputs,
                                       _decode)
from ahsoka_tpu.score.pairwise import AlleleMatrix


@dataclasses.dataclass
class ChainMatrix:
    """Filtered partial readset as dense arrays."""
    matrix: AlleleMatrix          # [R, P] alleles, -1 uncovered
    mapq: np.ndarray              # int32 [R]
    name_ids: np.ndarray          # int32 [R] indices into inputs.names


def chain_matrix_from_keys(inputs: ChainDeviceInputs,
                           part_keys: np.ndarray,
                           gate_keys: np.ndarray,
                           sweep_dense: np.ndarray,
                           config: PhasingConfig) -> ChainMatrix:
    """sweep_dense: dense bubble indices of the partial sweep positions,
    ascending (see readset.partial_position_sweep)."""
    bubble_ids = inputs.bubble_ids
    identity = inputs.aln_identity
    N = part_keys.shape[1]
    sd = np.asarray(sweep_dense, dtype=np.int64)
    if len(sd) == 0 or N == 0:
        empty = AlleleMatrix(
            alleles=np.zeros((0, 0), dtype=np.int16),
            positions=np.zeros(0, dtype=np.int32), read_names=[])
        return ChainMatrix(matrix=empty,
                           mapq=np.zeros(0, dtype=np.int32),
                           name_ids=np.zeros(0, dtype=np.int32))

    pk = part_keys[sd]                     # [Bs, N]
    gk = gate_keys[sd]
    pm = pk != NO_MATCH
    gm = gk != NO_MATCH
    p_allele, p_al = _decode(pk)
    g_allele, _ = _decode(gk)

    any_match = pm.any(axis=0)
    first_row = np.where(any_match, pm.argmax(axis=0), 0)

    rows = np.arange(len(sd))[:, None]     # [Bs, 1]
    after = rows > first_row[None, :]
    at_first = rows == first_row[None, :]
    # allele matrix over sweep rows: creation allele at the first row,
    # gated alleles after, -1 elsewhere
    alleles = np.where(at_first & any_match[None, :], p_allele,
                       np.where(after & gm & any_match[None, :],
                                g_allele, -1)).astype(np.int16)

    creation_al = p_al[first_row, np.arange(N)]
    mapq = (identity[creation_al] * config.mapq_scale).astype(np.int32)
    variant_count = (at_first & any_match[None, :]).sum(axis=0) + \
        (after & gm & any_match[None, :]).sum(axis=0)

    keep = (any_match & (variant_count >= config.min_variants)
            & (mapq >= config.mapq_threshold))
    kept = np.nonzero(keep)[0]

    # order: creation (first_row asc, then packed key at the first row),
    # then stable sort by first position — first position IS first_row, so
    # one stable sort by (first_row, creation key) suffices
    creation_key = pk[first_row[kept], kept].astype(np.int64)
    order = np.lexsort((creation_key, first_row[kept]))
    kept = kept[order]

    names = [inputs.names[i] for i in kept]
    # drop positions with no coverage from surviving reads — the object
    # path's ReadSet.positions() is the union over kept reads only
    kept_alleles = alleles[:, kept]
    covered = (kept_alleles >= 0).any(axis=1)
    mat = AlleleMatrix(
        alleles=np.ascontiguousarray(kept_alleles[covered].T),
        positions=bubble_ids[sd[covered]].astype(np.int32),
        read_names=names)
    return ChainMatrix(matrix=mat, mapq=mapq[kept],
                       name_ids=kept.astype(np.int32))


def partial_sweep_from_stats(inputs: ChainDeviceInputs,
                             full_keys: np.ndarray,
                             config: PhasingConfig) -> np.ndarray:
    """Dense sweep rows (ascending) replicating
    readset.partial_position_sweep on the winner tables.

    Full-pass mapq per name comes from the first match in bubble-iteration
    (stdmap) order — only reads passing the mapq/variant filter contribute
    boundary extensions."""
    B, N = full_keys.shape
    fm = full_keys != NO_MATCH
    any_match = fm.any(axis=0)
    if not any_match.any():
        return np.zeros(0, dtype=np.int64)
    covered_rows = np.nonzero(fm.any(axis=1))[0]
    last_covered = int(covered_rows[-1])

    # mapq via the stdmap-ranked first match (see device.assemble_readsets)
    if config.compat_std_ordering:
        from ahsoka_tpu.compat import native_iteration_order
        order = native_iteration_order([int(b) for b in inputs.bubble_ids])
        rank_of = {b: r for r, b in enumerate(order)}
        ranks = np.asarray([rank_of[int(b)] for b in inputs.bubble_ids],
                           dtype=np.int64)
    else:
        ranks = np.arange(B, dtype=np.int64)
    order_key = np.where(
        fm, ranks[:, None] * np.int64(1 << 31)
        + full_keys.astype(np.int64), np.int64(1 << 62))
    win_b = order_key.argmin(axis=0)
    _, win_al = _decode(full_keys[win_b, np.arange(N)])
    mapq = (inputs.aln_identity[win_al] * config.mapq_scale).astype(
        np.int32)
    counts = fm.sum(axis=0)
    filtered = (any_match & (counts >= config.min_variants)
                & (mapq >= config.mapq_threshold))

    first = np.where(filtered, fm.argmax(axis=0), -1)
    last = np.where(filtered, B - 1 - fm[::-1].argmax(axis=0), -1)
    first_set = set(int(x) for x in first[filtered])
    sweep = set(range(last_covered))
    for el in set(int(x) for x in last[filtered]):
        if el not in first_set:
            sweep.add(el)
            sweep.add(el + 1)
    # positions beyond the bubble table are no-ops (no allele paths there)
    return np.asarray(sorted(p for p in sweep if p < B), dtype=np.int64)
