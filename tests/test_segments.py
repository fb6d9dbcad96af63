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


# ---------------------------------------------------------------------------
# Skeleton-graph simplification (round-3 fidelity work)
# ---------------------------------------------------------------------------

from arterynetwork_tpu.graphs.segments import (  # noqa: E402
    simplify_chains, _chains_from_edge_indices)


def _chains_of(edges, n):
    a = np.asarray([e[0] for e in edges], np.int64)
    b = np.asarray([e[1] for e in edges], np.int64)
    return _chains_from_edge_indices(a, b, n)


def test_collapse_junction_cluster():
    """Two adjacent junction voxels with 2 branches each collapse to one
    4-way node; the 1-edge segment between them disappears."""
    # vertices: 0,1 = adjacent junctions; 2,3 hang off 0 via chains;
    # 4,5 hang off 1.  Chains long enough to survive pruning.
    # layout: 2-6-0, 3-7-0, 0-1, 1-8-4, 1-9-5
    edges = [(2, 6), (6, 10), (10, 0), (3, 7), (7, 11), (11, 0), (0, 1),
             (1, 8), (8, 12), (12, 4), (1, 9), (9, 13), (13, 5)]
    n = 14
    chains = _chains_of(edges, n)
    assert len(chains) == 5
    radius = np.ones(n, np.float32)
    out = simplify_chains(chains, n, radius, min_length=2,
                          radius_factor=0.0, cycle_tight_ratio=0.0)
    # 0/1 merged: 4 chains, all ending at the shared representative
    assert len(out) == 4
    reps = {c[-1] if c[0] != c[-1] else None for c in out}
    ends = [c[0] for c in out] + [c[-1] for c in out]
    junction = [v for v in set(ends) if ends.count(v) == 4]
    assert len(junction) == 1 and junction[0] in (0, 1)


def test_collapse_flag_only_gates_cluster_contraction():
    """skeleton_to_segments(collapse=False) must still run spur pruning
    / dedupe / cycle cutting — the flag disables ONLY the junction-
    cluster contraction (it was once accidentally a master switch)."""
    from arterynetwork_tpu.graphs.segments import skeleton_to_segments

    skel = np.zeros((8, 24, 24), bool)
    skel[4, 4:20, 4] = True       # main branch
    skel[4, 12, 5:8] = True       # 3-voxel terminal twig off its middle
    dt = np.ones(skel.shape, np.float32)
    _, segs = skeleton_to_segments(skel, prune_min_length=3,
                                   build_graph=False,
                                   distance_transform=dt, simplify=True,
                                   collapse=False)
    flat = {tuple(v) for s in segs for v in s}
    # twig pruned even with collapse off, and the junction it leaves
    # behind merges the two main halves into one chain
    assert (4, 12, 7) not in flat
    assert len(segs) == 1


def test_parallel_arc_dedupe():
    """Two short arcs between the same junction pair: the lower-radius
    one is dropped and the junctions merge through."""
    # pair (0, 1) connected by arcs 0-2-1 and 0-3-1; tails 4-0, 1-5
    edges = [(0, 2), (2, 1), (0, 3), (3, 1),
             (4, 6), (6, 0), (1, 7), (7, 5)]
    n = 8
    chains = _chains_of(edges, n)
    radius = np.ones(n, np.float32)
    radius[2] = 3.0   # arc through 2 is fatter -> kept
    out = simplify_chains(chains, n, radius, min_length=1,
                          collapse=False, radius_factor=0.0,
                          cycle_tight_ratio=0.0)
    flat = {v for c in out for v in c}
    assert 3 not in flat and 2 in flat
    # after the dedupe the junctions are degree 2 -> single chain
    assert len(out) == 1


def test_tight_cycle_cut_keeps_long_loops():
    """A small triangle of arcs is cut; a long loop survives."""
    # triangle between 0,1,2 with 2-voxel arcs; long tail chains off each
    def tail(start, base, length):
        return [(start if i == 0 else base + i - 1, base + i)
                for i in range(length)]
    edges = [(0, 10), (10, 1), (1, 11), (11, 2), (2, 12), (12, 0)]
    edges += tail(0, 20, 12) + tail(1, 40, 12) + tail(2, 60, 12)
    n = 80
    chains = _chains_of(edges, n)
    radius = np.full(n, 2.0, np.float32)
    out = simplify_chains(chains, n, radius, min_length=1,
                          collapse=False, radius_factor=0.0,
                          cycle_tight_ratio=16.0)
    # one triangle arc removed -> no cycle: edges == vertices - 1
    E = sum(len(c) - 1 for c in out)
    V = len({v for c in out for v in c})
    assert E == V - 1

    # a long loop (60 voxels, radius 1) is preserved
    loop = [(100 + i, 100 + (i + 1) % 60) for i in range(60)]
    n2 = 200
    chains2 = _chains_of(loop, n2)
    radius2 = np.ones(n2, np.float32)
    out2 = simplify_chains(chains2, n2, radius2, min_length=1,
                           collapse=False, radius_factor=0.0,
                           cycle_tight_ratio=16.0)
    E2 = sum(len(c) - 1 for c in out2)
    V2 = len({v for c in out2 for v in c})
    assert E2 == V2  # cycle intact


def test_junction_bridge_audit_cuts_redundant_twin_arc():
    """A short thinning twin arc between two junctions is removed (its
    geometry is covered by the direct arc) and the junctions merge
    through — the automated remove+merge edit."""
    from arterynetwork_tpu.graphs.segments import prune_junction_bridges

    coords = np.asarray([(i, 0, 0) for i in range(31)]
                        + [(11, 1, 0), (12, 1, 0), (13, 1, 0)],
                        np.float64)
    n = len(coords)
    edges = [(i, i + 1) for i in range(30)]
    edges += [(10, 31), (31, 32), (32, 33), (33, 14)]
    chains = _chains_of(edges, n)
    radius = np.ones(n, np.float32)
    radius[[31, 32, 33]] = 0.5       # twin arc is weaker
    out = prune_junction_bridges(chains, n, radius, coords=coords)
    flat = {v for c in out for v in c}
    assert not flat & {31, 32, 33}   # twin arc gone
    assert len(out) == 1             # junctions merged through
    assert set(out[0]) == set(range(31))


def test_junction_bridge_audit_keeps_uncovered_real_branch():
    """A short junction-junction arc on a cycle survives when nothing
    else covers its geometry (a real branch, not an artifact)."""
    from arterynetwork_tpu.graphs.segments import prune_junction_bridges

    coords = ([(i, 0, 0) for i in range(11)]          # stub to J1 (id 10)
              + [(10, j, 0) for j in range(1, 7)]     # direct arc 11..16
              + [(10, 6, j) for j in range(1, 6)]     # stub off J2 17..21
              + [(10 + i, 0, 0) for i in range(1, 7)]  # detour 22..27
              + [(16, j, 0) for j in range(1, 7)])    # detour 28..33
    coords = np.asarray(coords, np.float64)
    n = len(coords)
    J1, J2 = 10, 16
    edges = [(i, i + 1) for i in range(10)]           # stub -> J1
    edges += [(J1, 11)] + [(i, i + 1) for i in range(11, 16)]  # direct
    edges += [(J2, 17)] + [(i, i + 1) for i in range(17, 21)]  # stub
    edges += [(J1, 22)] + [(i, i + 1) for i in range(22, 27)]  # detour x
    edges += [(27, 28)] + [(i, i + 1) for i in range(28, 33)]  # detour y
    edges += [(33, J2)]
    chains = _chains_of(edges, n)
    radius = np.ones(n, np.float32)
    out = prune_junction_bridges(chains, n, radius, coords=coords,
                                 cover_tol=2.5)
    E = sum(len(c) - 1 for c in out)
    V = len({v for c in out for v in c})
    assert E == V                    # cycle intact: nothing was cut
    flat = {v for c in out for v in c}
    assert {11, 12, 13, 14, 15} <= flat


def test_radius_aware_spur_prune():
    """A spur shorter than factor*junction_radius is dropped; a real
    branch of the same length at a thin junction survives."""
    trunk = [(i, i + 1) for i in range(0, 20)]
    spur = [(10, 30), (30, 31), (31, 32), (32, 33)]  # 5 voxels incl. junction
    n = 40
    chains = _chains_of(trunk + spur, n)
    thick = np.ones(n, np.float32)
    thick[10] = 4.0   # junction radius 4 -> 2.5*4 = 10 > 5: prune
    out = simplify_chains(chains, n, thick, min_length=2,
                          collapse=False, radius_factor=2.5,
                          cycle_tight_ratio=0.0)
    assert len(out) == 1 and len(out[0]) == 21  # trunk re-merged

    thin = np.ones(n, np.float32)  # junction radius 1 -> keep the spur
    out2 = simplify_chains(_chains_of(trunk + spur, n), n, thin,
                           min_length=2, collapse=False,
                           radius_factor=2.5, cycle_tight_ratio=0.0)
    assert len(out2) == 3
