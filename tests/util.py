"""Shared test fixtures: tiny synthetic GFA/GAF builders."""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple


def seg_name(node_id: int) -> str:
    return f"utg{node_id:06d}l"


def gfa_lines(num_nodes: int,
              edges: Sequence[Tuple[int, str, int, str]],
              seqs: dict = None,
              symmetric: bool = True) -> List[str]:
    """Build GFA text lines.

    `edges` entries are (from_id, '+'|'-', to_id, '+'|'-'); with
    ``symmetric=True`` the reverse traversal L line is appended after the
    forward block, the way assemblers emit both orientations.
    """
    seqs = seqs or {}
    lines = []
    for nid in range(1, num_nodes + 1):
        lines.append(f"S\t{seg_name(nid)}\t{seqs.get(nid, 'ACGT')}\n")
    fwd = [f"L\t{seg_name(a)}\t{da}\t{seg_name(b)}\t{db}\t0M\n"
           for a, da, b, db in edges]
    lines.extend(fwd)
    if symmetric:
        flip = {"+": "-", "-": "+"}
        lines.extend(
            f"L\t{seg_name(b)}\t{flip[db]}\t{seg_name(a)}\t{flip[da]}\t0M\n"
            for a, da, b, db in edges)
    return lines


def bubble_chain_gfa(num_bubbles: int, arity: int = 2) -> List[str]:
    """A linear chain of `num_bubbles` simple bubbles:
    anchor -> {branches} -> anchor -> {branches} -> ...
    Returns GFA lines; node ids are assigned consecutively from 1 with
    anchors first: anchor_i = 1 + i*(arity+1), branches follow it."""
    edges = []
    nid = 1
    anchors = [nid]
    branches_per_bubble = []
    for _ in range(num_bubbles):
        branch_ids = list(range(nid + 1, nid + 1 + arity))
        next_anchor = nid + arity + 1
        for b in branch_ids:
            edges.append((nid, "+", b, "+"))
            edges.append((b, "+", next_anchor, "+"))
        branches_per_bubble.append(branch_ids)
        nid = next_anchor
        anchors.append(nid)
    return gfa_lines(nid, edges)


def simulate_diploid(num_bubbles: int = 6, reads_per_hap: int = 8,
                     span: int = 3, identity: float = 0.99,
                     error_rate: float = 0.0, seed: int = 0
                     ) -> Tuple[List[str], List[str], List[int], List[int]]:
    """Simulate a diploid dataset on a simple bubble chain.

    Returns (gfa_lines, gaf_lines, hapA_branch_nodes, hapB_branch_nodes).
    Anchors are 1, 4, 7, ...; bubble i has branches (3i+2, 3i+3).
    Haplotype A walks the lower branch of every bubble, B the upper.
    Reads tile the chain, each spanning `span` consecutive bubbles.
    """
    import random
    rng = random.Random(seed)
    glines = bubble_chain_gfa(num_bubbles)
    hapA = [3 * i + 2 for i in range(num_bubbles)]
    hapB = [3 * i + 3 for i in range(num_bubbles)]
    gaf = []
    ridx = 0
    for hap, other in ((hapA, hapB), (hapB, hapA)):
        for r in range(reads_per_hap):
            start_b = r % max(1, num_bubbles - span + 1)
            path = []
            for b in range(start_b, min(start_b + span, num_bubbles)):
                branch = hap[b]
                if error_rate and rng.random() < error_rate:
                    branch = other[b]
                path.append((3 * b + 1, "+"))   # anchor
                path.append((branch, "+"))
            path.append((3 * min(start_b + span, num_bubbles) + 1, "+"))
            gaf.append(gaf_line(f"read{ridx}", path, identity))
            ridx += 1
    return glines, gaf, hapA, hapB


def simulate_multichain(num_chains: int = 10, bubbles_per_chain: int = 20,
                        reads_per_hap: int = 20, span: int = 3,
                        identity: float = 0.99, error_rate: float = 0.0,
                        seed: int = 0) -> Tuple[List[str], List[str]]:
    """Multiple disconnected diploid bubble chains in one GFA (the
    chromosome-scale shape: many independent chains, reads per chain)."""
    import random
    rng = random.Random(seed)
    glines: List[str] = []
    gaf: List[str] = []
    base = 0
    ridx = 0
    for c in range(num_chains):
        edges = []
        nid = base + 1
        for b in range(bubbles_per_chain):
            b1, b2, nxt = nid + 1, nid + 2, nid + 3
            edges += [(nid, "+", b1, "+"), (nid, "+", b2, "+"),
                      (b1, "+", nxt, "+"), (b2, "+", nxt, "+")]
            nid = nxt
        seqs = {}
        lines = []
        for node in range(base + 1, nid + 1):
            lines.append(f"S\t{seg_name(node)}\tACGT\n")
        flip = {"+": "-", "-": "+"}
        for a, da, bb, db in edges:
            lines.append(f"L\t{seg_name(a)}\t{da}\t{seg_name(bb)}\t{db}\t0M\n")
        for a, da, bb, db in edges:
            lines.append(
                f"L\t{seg_name(bb)}\t{flip[db]}\t{seg_name(a)}\t{flip[da]}\t0M\n")
        glines.extend(lines)
        hapA = [base + 3 * b + 2 for b in range(bubbles_per_chain)]
        hapB = [base + 3 * b + 3 for b in range(bubbles_per_chain)]
        for hap, other in ((hapA, hapB), (hapB, hapA)):
            for r in range(reads_per_hap):
                start_b = r % max(1, bubbles_per_chain - span + 1)
                path = []
                for b in range(start_b,
                               min(start_b + span, bubbles_per_chain)):
                    branch = hap[b]
                    if error_rate and rng.random() < error_rate:
                        branch = other[b]
                    path.append((base + 3 * b + 1, "+"))
                    path.append((branch, "+"))
                path.append(
                    (base + 3 * min(start_b + span, bubbles_per_chain) + 1,
                     "+"))
                gaf.append(gaf_line(f"read{ridx}", path, identity))
                ridx += 1
        base = nid
    return glines, gaf


def simulate_polyploid(ploidy: int = 4, num_bubbles: int = 5,
                       reads_per_hap: int = 8, span: int = 3,
                       identity: float = 0.99, seed: int = 0
                       ) -> Tuple[List[str], List[str], List[List[int]]]:
    """Polyploid chain: each bubble has `ploidy` branches; haplotype h
    walks branch h of every bubble.  Returns (gfa, gaf, branch sets)."""
    glines = bubble_chain_gfa(num_bubbles, arity=ploidy)
    step = ploidy + 1
    haps = [[step * b + 2 + h for b in range(num_bubbles)]
            for h in range(ploidy)]
    gaf = []
    ridx = 0
    for h in range(ploidy):
        for r in range(reads_per_hap):
            start_b = r % max(1, num_bubbles - span + 1)
            path = []
            for b in range(start_b, min(start_b + span, num_bubbles)):
                path.append((step * b + 1, "+"))
                path.append((haps[h][b], "+"))
            path.append((step * min(start_b + span, num_bubbles) + 1, "+"))
            gaf.append(gaf_line(f"read{ridx}", path, identity))
            ridx += 1
    return glines, gaf, haps


def gaf_line(name: str, path: Sequence[Tuple[int, str]], identity: float,
             start: int = 0, end: int = 1000, qlen: int = 1000) -> str:
    """One GAF record with the column layout the reference parser expects
    (identity tag ``id:f:X`` at column 16, src/alignmentreader.cpp:112-135).
    """
    pathstr = "".join(
        ("<" if d == "-" else ">") + seg_name(nid) for nid, d in path)
    cols = [
        name,             # 1  query name
        str(qlen),        # 2  query length
        "0",              # 3  query start
        str(qlen),        # 4  query end
        "+",              # 5  strand
        pathstr,          # 6  path
        str(end - start), # 7  path length
        str(start),       # 8  start on path
        str(end),         # 9  end on path
        "100",            # 10 residue matches
        str(end - start), # 11 block length
        "60",             # 12 mapq
        "tp:A:P",         # 13
        "cm:i:10",        # 14
        "NM:i:0",         # 15 (reference skips this as 'mbgdummy')
        f"id:f:{identity}",  # 16 identity tag
    ]
    return "\t".join(cols) + "\n"
