"""Parent/child ordering at bifurcations, pinned to the reference's
depthVoxel rule and its max-cosine fallback (graphRelated.py:152-207):

* the depth rule applies ONLY when the node ranks second-shallowest
  among {three branch second-voxels, node}; then
  order = [sortedIndex[2], sortedIndex[3], sortedIndex[0]]
  (children deeper-first pair, parent = the shallower branch);
* any other ranking (root junction, converging BFS waves) and missing
  depth info fall back to pairing the two branches whose unnormalized
  spline tangents at the node have maximal dot product.
"""

import networkx as nx
import numpy as np

from arterynetwork_tpu.graphs.branch_attrs import calculate_branch_info
from arterynetwork_tpu.graphs.traversal import partition_bfs
from arterynetwork_tpu.morpho.metrics import calculate_property


def _build(segments):
    G = calculate_branch_info(segments, segments,
                              distance_transform=np.ones((40, 40, 40),
                                                         np.float32))
    return G


def test_depth_rule_identifies_parent():
    """Y fed by BFS from the root: node ranks second-shallowest, so the
    upstream chain is the parent (order position 2)."""
    trunk = [(0, 10, 10 + i) for i in range(6)]          # root .. junction
    child_a = [(0, 10 + i, 15 + i) for i in range(6)]    # junction ..
    child_b = [(0, 10 - i, 15 + i) for i in range(6)]
    child_a[0] = child_b[0] = trunk[-1]
    segments = [child_a, trunk, child_b]  # parent deliberately NOT first
    G = _build(segments)
    partition_bfs(G, [trunk[0]], [])

    node_info, seg_info = calculate_property(G, segments, min_nodes=3)
    junction = trunk[-1]
    info = node_info[junction]
    assert info["orderedSegments"][2] == 1  # trunk is the parent
    assert set(info["orderedSegments"][:2]) == {0, 2}
    # children sorted by their second voxel's depthVoxel (tie -> stable
    # argsort keeps list order: child_a before child_b)
    assert info["orderedSegments"][:2] == [0, 2]
    assert "localBifurcationAmplitude" in info
    # both children leave at ~45 deg on opposite sides -> amplitude ~90
    assert 60 < info["localBifurcationAmplitude"] < 120


def test_converging_waves_fall_back_and_skip():
    """A diamond merging at the junction: two branches arrive shallower
    than the node (node ranks third), the depth rule must NOT apply —
    with skipUncategorizedVoxels the node gets no bifurcation metrics."""
    # two arms from the root fork converge at J, one branch continues
    arm_a = [(0, 10, 10), (0, 12, 11), (0, 13, 12), (0, 13, 14),
             (0, 12, 15), (0, 10, 16)]
    arm_b = [(0, 10, 10), (0, 8, 11), (0, 7, 12), (0, 7, 14),
             (0, 8, 15), (0, 10, 16)]
    out = [(0, 10, 16), (0, 10, 17), (0, 10, 18), (0, 10, 19)]
    segments = [arm_a, arm_b, out]
    G = _build(segments)
    partition_bfs(G, [(0, 10, 10)], [])
    J = (0, 10, 16)
    assert G.degree(J) == 3
    # precondition of the case: node deeper than two branch second-voxels
    dv = nx.get_node_attributes(G, "depthVoxel")
    n_shallower = sum(dv[seg[-2] if seg[-1] == J else seg[1]] < dv[J]
                      for seg in segments)
    assert n_shallower == 2

    node_info, _ = calculate_property(G, segments, min_nodes=3,
                                      skip_uncategorized=True)
    assert "localBifurcationAmplitude" not in node_info.get(J, {})
    assert "orderedSegments" not in node_info.get(J, {})


def test_max_cosine_fallback_pairs_aligned_branches():
    """No depth info at all: the two branches leaving the node in nearly
    the same direction (max unnormalized tangent dot product) become the
    child pair; the anti-aligned one is the parent."""
    J = (5, 20, 20)
    parent = [J, (5, 20, 19), (5, 20, 18), (5, 20, 17), (5, 20, 16)]
    child_a = [J, (6, 20, 21), (7, 20, 22), (8, 20, 23), (9, 20, 24)]
    child_b = [J, (5, 21, 21), (5, 22, 22), (5, 23, 23), (5, 24, 24)]
    segments = [parent, child_a, child_b]
    G = _build(segments)
    # no partition_bfs: no depthVoxel anywhere -> fallback path

    node_info, _ = calculate_property(G, segments, min_nodes=3,
                                      skip_uncategorized=False)
    info = node_info[J]
    # children share the +z heading (tangent dot > 0); the parent is
    # anti-aligned with both (dot < 0), so max-cosine pairs the children
    assert info["orderedSegments"] == [1, 2, 0]
    assert 50 < info["localBifurcationAmplitude"] < 110
