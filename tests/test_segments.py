"""Segment extraction / simple-branch contract tests (reference C5/C6)."""

import numpy as np

from arterynetwork_tpu.graphs.segments import (
    extract_segments,
    process_segments,
    prune_spurs,
    segments_to_graph,
    skeleton_to_segments,
    skeleton_to_voxel_graph,
    validate_segment,
)


def _y_skeleton():
    """A Y: trunk + two branches meeting at a junction."""
    vol = np.zeros((20, 20, 20), bool)
    for z in range(2, 10):
        vol[z, 10, 10] = True            # trunk
    for i in range(8):
        vol[10 + i, 10 + i, 10] = True   # branch A (diagonal)
        vol[10 + i, 10 - i, 10] = True   # branch B
    return vol


def test_extract_simple_branches():
    vol = _y_skeleton()
    G, segments = skeleton_to_segments(vol)
    assert len(segments) == 3
    for seg in segments:
        assert validate_segment(G, seg)
    # every skeleton voxel appears in some segment
    covered = {v for s in segments for v in s}
    assert covered == {tuple(c) for c in np.argwhere(vol)}


def test_process_segments_dedupe_and_merge():
    """Rough overlapping/duplicated chains collapse to simple branches
    (processSegments contract, skeletonization.py:299-518)."""
    vol = _y_skeleton()
    _, segments = skeleton_to_segments(vol)
    # build a deliberately messy input: duplicates, reversed duplicates,
    # and one branch split into two sub-chains
    rough = [segments[0], segments[0][::-1], segments[1],
             segments[2][:4], segments[2][3:]]
    G, cleaned, errors = process_segments(rough)
    assert errors == []
    assert len(cleaned) == 3
    for seg in cleaned:
        assert validate_segment(G, seg)
    covered = {v for s in cleaned for v in s}
    assert covered == {v for s in segments for v in s}


def test_cycle_extraction():
    """A closed loop becomes one chain (CoW loops must survive)."""
    vol = np.zeros((12, 12, 3), bool)
    ring = [(2, 2), (2, 5), (2, 8), (5, 8), (8, 8), (8, 5), (8, 2), (5, 2)]
    # rasterize a rectangle ring
    for y in range(2, 9):
        vol[2, y, 1] = True
        vol[8, y, 1] = True
    for z in range(2, 9):
        vol[z, 2, 1] = True
        vol[z, 8, 1] = True
    G = skeleton_to_voxel_graph(vol)
    segments = extract_segments(G)
    covered = {v for s in segments for v in s}
    assert covered == {tuple(c) for c in np.argwhere(vol)}
    # all edges covered exactly once
    n_edges = sum(len(s) - 1 for s in segments)
    assert n_edges == G.number_of_edges()


def test_prune_spurs():
    vol = _y_skeleton().copy()
    # add a 2-voxel spur off the trunk.  NOTE: in 26-adjacency the spur
    # root is adjacent to three consecutive trunk voxels, creating a small
    # junction cluster — the same artifact class the reference's GUI loop
    # detection exists for (manualCorrectionGUIDetail.py:642-684).  The
    # prune drops terminal segments; junction-cluster remnants are handled
    # at graph reduction.
    vol[5, 11, 10] = True
    vol[5, 12, 11] = True
    _, segments = skeleton_to_segments(vol)
    pruned = prune_spurs(segments, min_length=2)
    G = segments_to_graph(pruned)
    for seg in pruned:
        assert validate_segment(G, seg)
    # the spur tip is gone and the three true branch tips survive
    tips = {s[0] for s in pruned if G.degree(s[0]) == 1}
    tips |= {s[-1] for s in pruned if G.degree(s[-1]) == 1}
    assert (5, 12, 11) not in tips
    assert (2, 10, 10) in tips and (17, 17, 10) in tips and (17, 3, 10) in tips


def test_prune_spurs_keeps_cycles_and_merges_through_junctions():
    """Index-level pruning: a loop with a short spur loses the spur, and
    the two loop arcs re-merge through the junction that dropped to
    degree 2 (CoW loops must survive spur cleanup intact)."""
    import numpy as np

    from arterynetwork_tpu.graphs.segments import skeleton_to_segments

    skel = np.zeros((3, 16, 16), bool)
    # diamond ring |y-8|+|x-8| == 5 (chord-free under 26-adjacency,
    # unlike an axis-aligned rectangle whose corners add diagonal edges)
    for y in range(16):
        for x in range(16):
            if abs(y - 8) + abs(x - 8) == 5:
                skel[1, y, x] = True
    # 2-voxel spur hanging off the ring apex (1, 3, 8)
    skel[1, 2, 8] = True
    skel[1, 1, 8] = True

    _, segs = skeleton_to_segments(skel, prune_min_length=3,
                                   build_graph=False)
    # after pruning the spur, the loop is a single closed chain
    assert len(segs) == 1
    seg = segs[0]
    assert seg[0] == seg[-1]
    voxels = {tuple(v) for v in seg}
    assert (1, 2, 8) not in voxels and (1, 1, 8) not in voxels
    assert len(voxels) == 20  # the full diamond ring
