"""Centerline segments and the voxel-level vessel graph.

Host-side counterpart of the reference's segment post-processing
(skeletonization.py:233-537): turn a skeleton voxel mask (or a rough
segment list) into *simple branches* — centerpoint chains whose interior
voxels have degree 2 and whose ends are junctions (degree >= 3) or tips
(degree 1).

The reference repairs Tabb's rough segment output in place (pairwise
dedupe, split at interior bifurcations, iterative merge of degree-2
endpoints, skeletonization.py:299-518).  All of those operations are
equivalent to *re-extracting* simple branches from the union voxel graph,
which is what we do: build the 26-adjacency graph, walk chains between
degree!=2 voxels (the reference's own ``getSegmentList`` DFS,
skeletonization.py:539-601, does the same).  Pure cycles (all degree 2)
become single closed chains.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import networkx as nx
import numpy as np

Voxel = Tuple[int, int, int]

_NEIGHBOR_OFFSETS = [(dz, dy, dx)
                     for dz in (-1, 0, 1)
                     for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1)
                     if (dz, dy, dx) != (0, 0, 0)]


def skeleton_to_voxel_graph(skeleton) -> nx.Graph:
    """26-adjacency graph over skeleton voxels (nodes are voxel tuples)."""
    skeleton = np.asarray(skeleton)
    coords = {tuple(int(v) for v in c) for c in np.argwhere(skeleton)}
    G = nx.Graph()
    G.add_nodes_from(coords)
    for (z, y, x) in coords:
        for (dz, dy, dx) in _NEIGHBOR_OFFSETS:
            q = (z + dz, y + dy, x + dx)
            if q in coords:
                G.add_edge((z, y, x), q)
    return G


def extract_segments(G: nx.Graph) -> List[List[Voxel]]:
    """Partition a voxel graph into simple branches.

    Every edge belongs to exactly one chain; chains break at voxels with
    degree != 2.  Same partition semantics as the reference's
    ``getSegmentList`` (skeletonization.py:539-601).
    """
    segments: List[List[Voxel]] = []
    visited = set()  # undirected edge keys

    def edge_key(a, b):
        return (a, b) if a <= b else (b, a)

    breakpoints = [n for n in G.nodes() if G.degree(n) != 2]
    for start in breakpoints:
        for nbr in G.neighbors(start):
            if edge_key(start, nbr) in visited:
                continue
            chain = [start, nbr]
            visited.add(edge_key(start, nbr))
            cur, prev = nbr, start
            while G.degree(cur) == 2:
                nxts = [n for n in G.neighbors(cur) if n != prev]
                if not nxts:
                    break
                nxt = nxts[0]
                if edge_key(cur, nxt) in visited:
                    break
                visited.add(edge_key(cur, nxt))
                chain.append(nxt)
                prev, cur = cur, nxt
            segments.append(chain)

    # pure cycles: remaining unvisited edges form degree-2 loops
    for a, b in G.edges():
        if edge_key(a, b) in visited:
            continue
        chain = [a, b]
        visited.add(edge_key(a, b))
        cur, prev = b, a
        while True:
            nxts = [n for n in G.neighbors(cur)
                    if edge_key(cur, n) not in visited]
            if not nxts:
                break
            nxt = nxts[0]
            visited.add(edge_key(cur, nxt))
            chain.append(nxt)
            prev, cur = cur, nxt
        segments.append(chain)

    return segments


def segments_to_graph(segments: Sequence[Sequence[Voxel]]) -> nx.Graph:
    """Voxel graph with per-edge ``segmentIndex`` (skeletonization.py:765-769)."""
    G = nx.Graph()
    for idx, seg in enumerate(segments):
        for a, b in zip(seg[:-1], seg[1:]):
            G.add_edge(tuple(a), tuple(b), segmentIndex=idx)
    return G


def validate_segment(G: nx.Graph, segment: Sequence[Voxel]) -> bool:
    """True iff the segment is a simple branch (skeletonization.py:649-680)."""
    degrees = [G.degree(v) for v in segment]
    if len(degrees) < 2:
        return False
    if degrees[0] == 2 or degrees[-1] == 2:
        return False
    return all(d == 2 for d in degrees[1:-1])


def process_segments(segment_list: Sequence[Sequence[Voxel]]):
    """Re-partition rough segments into simple branches.

    Contract parity with the reference's ``processSegments``
    (skeletonization.py:233-537): duplicates removed, interior
    bifurcations split, degree-2 endpoints merged.  Implemented by
    rebuilding the union voxel graph and re-extracting chains, which
    yields the same simple-branch partition without the iterative repair.

    Returns (G, segments, error_segments); error_segments is always empty
    here because re-extraction cannot produce invalid branches.
    """
    union = nx.Graph()
    for seg in segment_list:
        seg = [tuple(int(c) for c in v) for v in seg]
        for a, b in zip(seg[:-1], seg[1:]):
            union.add_edge(a, b)
    segments = extract_segments(union)
    G = segments_to_graph(segments)
    error_segments: List[List[Voxel]] = []
    return G, segments, error_segments


def prune_spurs(segments: Sequence[Sequence[Voxel]],
                min_length: int = 3,
                iterations: int = 2) -> List[List[Voxel]]:
    """Drop short terminal branches and re-extract.

    Generalization of the reference's removal of 2-voxel terminating
    branches before saving (manualCorrectionGUIDetail.py:1571-1625) —
    also cleans the radius-length end spurs left by curve-preserving
    thinning.  A terminal branch is dropped when it has <= min_length
    voxels; junction voxels shared with other branches are kept.
    """
    segs = [list(map(tuple, s)) for s in segments]
    for _ in range(iterations):
        G = segments_to_graph(segs)
        keep = []
        changed = False
        for seg in segs:
            is_terminal = G.degree(seg[0]) == 1 or G.degree(seg[-1]) == 1
            if is_terminal and len(seg) <= min_length:
                changed = True
                continue
            keep.append(seg)
        if not changed:
            break
        union = nx.Graph()
        for seg in keep:
            for a, b in zip(seg[:-1], seg[1:]):
                union.add_edge(a, b)
        segs = extract_segments(union)
    return segs


def skeleton_to_segments(skeleton, prune_min_length: int = 0):
    """Skeleton mask -> (G, segmentList): the output contract of the
    reference's skeletonization stage (graphRepresentation + segmentList,
    skeletonization.py:745-790)."""
    G0 = skeleton_to_voxel_graph(skeleton)
    segments = extract_segments(G0)
    if prune_min_length > 0:
        segments = prune_spurs(segments, min_length=prune_min_length)
    G = segments_to_graph(segments)
    return G, segments
