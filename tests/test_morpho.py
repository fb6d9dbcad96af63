"""Morphology metric tests on synthetic geometry with known answers."""

import numpy as np
import networkx as nx

from arterynetwork_tpu.graphs.branch_attrs import calculate_branch_info
from arterynetwork_tpu.graphs.traversal import partition_bfs, reduce_graph
from arterynetwork_tpu.morpho.curvature import calculate_curvature
from arterynetwork_tpu.morpho.metrics import calculate_property, summarize
from arterynetwork_tpu.morpho.spline import curvature_by_triangle


def _y_segments(n=14):
    """Three straight branches meeting at the origin-ish junction."""
    j = (30, 30, 30)
    trunk = [(30, 30, 30 - i) for i in range(n)][::-1]   # along -z, ends at j
    a = [(30 + i, 30 + i, 30 + i) for i in range(n)]     # diagonal up
    b = [(30 + i, 30 - i, 30 + i) for i in range(n)]     # diagonal other way
    a[0] = j; b[0] = j
    return [trunk, a, b]


def _graph_from_segments(segments, radii=(3.0, 2.0, 2.0)):
    G = nx.Graph()
    for seg, r in zip(segments, radii):
        arr = np.asarray(seg, float)
        pl = float(np.linalg.norm(arr[1:] - arr[:-1], axis=1).sum())
        el = float(np.linalg.norm(arr[-1] - arr[0]))
        for x, y in zip(seg[:-1], seg[1:]):
            G.add_edge(tuple(x), tuple(y), pathLength=pl,
                       eculideanLength=el, tortuosity=pl / el,
                       voxelLength=len(seg), meanRadius=float(r),
                       segmentIndex=segments.index(seg))
    for node in G.nodes():
        G.nodes[node]["radius"] = 2.0
    return G


def test_bifurcation_metrics_on_y():
    segments = _y_segments()
    G = _graph_from_segments(segments)
    # annotate depth from the trunk tip so ordering uses depthVoxel
    root = segments[0][0]
    partition_bfs(G, [root], [])
    node_info, segment_info = calculate_property(
        G, segments, min_nodes=5)

    junction = (30, 30, 30)
    ninfo = node_info[junction]
    # the two diagonal children (1,1,1) and (1,-1,1) have angle
    # arccos(1/3) ~ 70.5 degrees between them
    assert abs(ninfo["remoteBifurcationAmplitude"] - 70.53) < 2.0
    assert abs(ninfo["localBifurcationAmplitude"] - 70.53) < 12.0
    # Murray / square law with radii (2,2) -> 3 parent
    assert abs(ninfo["cubicLawResult"] - 16.0 / 27.0) < 1e-9
    assert abs(ninfo["squareLawResult"] - 8.0 / 9.0) < 1e-9
    assert ninfo["minRadiusRatio"] == 2.0 / 3.0

    # segment types
    types = {segment_info[i]["type"] for i in range(3)}
    assert types == {"terminating"}

    s = summarize(node_info, segment_info)
    assert s["numBranches"] == 3
    assert s["numTerminating"] == 3
    assert s["numBifurcating"] == 1


def test_partition_bfs_depths():
    segments = _y_segments()
    G = _graph_from_segments(segments)
    root = segments[0][0]
    G2, visited, seg_ids = partition_bfs(G, [root], [])
    junction = (30, 30, 30)
    assert G2.nodes[root]["depthLevel"] == 0
    # depthLevel increments at the junction (degree 3)
    assert G2.nodes[junction]["depthLevel"] == 1
    tip_a = segments[1][-1]
    assert G2.nodes[tip_a]["depthLevel"] == 2
    assert G2.nodes[tip_a]["pathDistance"] > 0
    assert set(seg_ids) == {0, 1, 2}
    assert len(visited) == len(G.nodes())


def test_random_walk_bfs2_replays_without_mutating():
    """randomWalkBFS2 (myFunctions.py:100-151): re-traverses the stored
    depthVoxel labels, reproducing partition_bfs's reach and segment
    list without touching the graph."""
    from arterynetwork_tpu.graphs.traversal import random_walk_bfs2

    segments = _y_segments()
    G = _graph_from_segments(segments)
    root = segments[0][0]
    partition_bfs(G, [root], [])
    before = {n: dict(G.nodes[n]) for n in G.nodes()}

    G2, visited, seg_ids = random_walk_bfs2(G, [root], [])
    assert set(visited) == set(G.nodes())
    assert set(seg_ids) == {0, 1, 2}
    after = {n: dict(G.nodes[n]) for n in G.nodes()}
    assert before == after  # non-mutating

    # boundary voxels stop the walk
    junction = (30, 30, 30)
    _, visited_b, seg_ids_b = random_walk_bfs2(G, [root], [junction])
    assert junction not in visited_b
    assert len(visited_b) < len(visited)


def test_random_walk_bfs2_duplicate_multiplicity_on_diamond():
    """Reference parity (myFunctions.py:136-146): a voxel reachable from
    two same-depth parents is appended once per entering edge — there is
    no visited-set dedupe in randomWalkBFS2."""
    import networkx as nx

    from arterynetwork_tpu.graphs.traversal import random_walk_bfs2

    G = nx.Graph()
    a, b, c, d = (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)
    for u, v, s in [(a, b, 0), (a, c, 1), (b, d, 2), (c, d, 3)]:
        G.add_edge(u, v, segmentIndex=s)
    depths = {a: 0, b: 1, c: 1, d: 2}
    for n, dep in depths.items():
        G.nodes[n]["depthVoxel"] = dep

    _, visited, seg_ids = random_walk_bfs2(G, [a], [])
    # d enters via b AND via c: appended twice
    assert visited.count(d) == 2
    assert len(visited) == 5


def test_reduce_graph():
    segments = _y_segments()
    G = _graph_from_segments(segments)
    partition_bfs(G, [segments[0][0]], [])
    DG = reduce_graph(G, segments, [0, 1, 2])
    assert DG.number_of_edges() == 3
    assert DG.number_of_nodes() == 4
    # attributes copied
    for a, b in DG.edges():
        assert "meanRadius" in DG[a][b]


def test_curvature_of_circular_arc():
    """A quarter-circle branch of radius R has curvature ~ 1/R."""
    R = 20.0
    n = 40
    theta = np.linspace(0, np.pi / 2, n)
    pts = [(30 + R * np.cos(t), 30 + R * np.sin(t), 10.0) for t in theta]
    pts = [tuple(np.round(p, 0)) for p in pts]
    # dedupe consecutive equal voxels
    arc = [pts[0]]
    for p in pts[1:]:
        if p != arc[-1]:
            arc.append(p)
    G = nx.Graph()
    arr = np.asarray(arc, float)
    pl = float(np.linalg.norm(arr[1:] - arr[:-1], axis=1).sum())
    for a, b in zip(arc[:-1], arc[1:]):
        G.add_edge(a, b, segmentIndex=0, pathLength=pl)
    segment_info = {0: {"pathLength": pl}}
    partitions = {"P": {
        "initial_voxels": [arc[0]],
        "boundary_voxels": [],
        "visited_voxels": arc,
        "segment_index_list": [0],
    }}
    spacing = 1.0  # work in voxel=mm units for the check
    out = calculate_curvature(G, segment_info, partitions,
                              spacing_factor_mm=spacing)
    mean_curv = out[0]["meanCurvatureAveragedInmm"]
    assert abs(mean_curv - 1.0 / R) < 0.35 / R


def test_curvature_by_triangle_exact():
    # three points on a circle of radius 5 -> curvature 0.2
    R = 5.0
    ang = [0.0, 0.3, 0.6]
    pts = [(R * np.cos(a), R * np.sin(a), 0.0) for a in ang]
    k = curvature_by_triangle(pts)
    assert abs(k - 1.0 / R) < 1e-6


def test_partition_compartments_and_save(tmp_path):
    from arterynetwork_tpu.graphs.partitioning import (
        load_partition, partition_compartments, save_partition)
    from arterynetwork_tpu.io.artifacts import ArtifactStore

    segments = _y_segments()
    G = _graph_from_segments(segments)
    junction = (30, 30, 30)
    chosen = {
        "A": {"initial_voxels": [segments[1][1]], "boundary_voxels": [junction]},
        "B": {"initial_voxels": [segments[2][1]], "boundary_voxels": [junction]},
    }
    info = partition_compartments(G, segments, chosen)
    # each compartment covers its branch, bounded at the junction
    assert set(info) == {"A", "B"}
    tip_a, tip_b = segments[1][-1], segments[2][-1]
    assert tuple(tip_a) in set(map(tuple, info["A"]["visited_voxels"]))
    assert tuple(tip_b) in set(map(tuple, info["B"]["visited_voxels"]))
    assert G.nodes[tuple(tip_a)]["partitionName"] == "A"
    # segment levels assigned on edges of traversed segments
    assert any("segmentLevel" in d for _, _, d in G.edges(data=True))

    store = ArtifactStore(str(tmp_path))
    save_partition(store, chosen, info, G)
    chosen2, info2 = load_partition(store)
    assert set(chosen2) == {"A", "B"}
    assert info2["A"]["segment_index_list"] == info["A"]["segment_index_list"]
    assert store.exists("graphRepresentationCleanedWithAdvancedInfo.graphml")
