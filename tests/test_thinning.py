"""Skeletonization acceptance tests.

The Tabb binary has no oracle we can run; acceptance is defined by the
skeleton *properties* the downstream pipeline relies on
(skeletonization.py:233-537 expects 26-connected centerline chains):

  * topology preserved: same number of 26-connected components;
  * thin: every remaining voxel is either non-simple or an endpoint;
  * centered: for a straight tube, the skeleton lies on the tube axis;
  * complete: endpoints of a tube survive (curve ends preserved).
"""

import numpy as np
from scipy import ndimage

from arterynetwork_tpu.ops.thinning import simple_point_mask, skeletonize


def _components(mask):
    s26 = ndimage.generate_binary_structure(3, 3)
    _, n = ndimage.label(mask, structure=s26)
    return n


def test_straight_tube_skeleton():
    shape = (24, 24, 48)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    tube = (((x - 12) ** 2 + (y - 12) ** 2 <= 4 ** 2)
            & (z >= 4) & (z < 44)).astype(np.uint8)

    skel = np.asarray(skeletonize(tube))
    assert _components(skel) == _components(tube) == 1
    coords = np.argwhere(skel)
    # centered on the tube axis (within 1 voxel) away from the end caps,
    # where curve-preserving thinning leaves radius-length spurs (the
    # reference pipeline prunes short terminal branches at save time,
    # manualCorrectionGUIDetail.py:1571-1625)
    mid = coords[(coords[:, 2] >= 9) & (coords[:, 2] < 39)]
    assert np.all(np.abs(mid[:, 0] - 12) <= 1)
    assert np.all(np.abs(mid[:, 1] - 12) <= 1)
    # spans the tube up to one radius from each end cap (the medial axis
    # of a capped cylinder terminates where the maximal inscribed sphere
    # touches the cap, i.e. ~radius voxels short)
    assert coords[:, 2].min() <= 8 and coords[:, 2].max() >= 39
    # voxel count ~ tube length (a chain, not a surface)
    assert len(coords) <= 56


def test_bent_tube_connectivity():
    shape = (40, 40, 40)
    vol = np.zeros(shape, np.uint8)
    # L-shaped tube
    vol[18:23, 18:23, 5:22] = 1
    vol[18:23, 18:35, 17:22] = 1
    skel = np.asarray(skeletonize(vol))
    assert _components(skel) == 1
    assert skel.sum() < vol.sum() * 0.25


def test_bifurcating_tube():
    shape = (40, 48, 48)
    vol = np.zeros(shape, np.uint8)
    vol[18:23, 22:27, 4:24] = 1       # trunk
    vol[18:23, 10:15, 28:44] = 1      # branch A
    vol[18:23, 34:39, 28:44] = 1      # branch B
    # connectors
    for t in np.linspace(0, 1, 24):
        y = int(round(24 - 12 * t)); z = int(round(22 + 8 * t))
        vol[18:23, y - 2:y + 3, z - 2:z + 3] = 1
        y = int(round(24 + 12 * t))
        vol[18:23, y - 2:y + 3, z - 2:z + 3] = 1
    skel = np.asarray(skeletonize(vol))
    assert _components(skel) == 1
    # skeleton has at least one branch voxel (>= 3 neighbors)
    from arterynetwork_tpu.ops.stencil import neighbor_count26
    deg = np.asarray(neighbor_count26(skel))
    assert (deg[skel.astype(bool)] >= 3).any()
    # and at least 3 endpoints (trunk start + two branch tips)
    assert (deg[skel.astype(bool)] == 1).sum() >= 3


def test_no_simple_nonendpoint_voxels_remain():
    shape = (24, 24, 40)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    tube = (((x - 12) ** 2 + (y - 12) ** 2 <= 3 ** 2)
            & (z >= 4) & (z < 36)).astype(np.uint8)
    skel = np.asarray(skeletonize(tube))
    simple = np.asarray(simple_point_mask(skel.astype(bool)))
    from arterynetwork_tpu.ops.stencil import neighbor_count26
    deg = np.asarray(neighbor_count26(skel))
    deletable = simple & (deg > 1) & skel.astype(bool)
    assert not deletable.any(), "skeleton not thin: simple points remain"


def test_torus_topology_preserved():
    """A solid torus must keep its loop (cycle) after thinning."""
    shape = (40, 40, 16)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    r = np.sqrt((x - 20) ** 2 + (y - 20) ** 2)
    torus = (((r - 10) ** 2 + (z - 8) ** 2) <= 3 ** 2).astype(np.uint8)
    skel = np.asarray(skeletonize(torus))
    assert _components(skel) == 1
    # the skeleton of a torus must contain a cycle (tunnel preserved);
    # short endpoint spurs off the ring are tolerated (pruned downstream)
    import networkx as nx
    coords = [tuple(c) for c in np.argwhere(skel)]
    G = nx.Graph()
    G.add_nodes_from(coords)
    cs = set(coords)
    for (a, b, c) in coords:
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if (da, db, dc) != (0, 0, 0) and (a+da, b+db, c+dc) in cs:
                        G.add_edge((a, b, c), (a+da, b+db, c+dc))
    assert len(nx.cycle_basis(G)) >= 1
    assert skel.sum() >= 20
