"""Native (C++) kernels: build, predicate parity, thinning parity."""

import numpy as np
import pytest
from scipy import ndimage

from arterynetwork_tpu.ops.native import (
    simple_point_native,
    skeletonize_native,
)


def test_simple_point_predicate_parity_with_python():
    """C++ and JAX-derived predicates agree on random configs."""
    from arterynetwork_tpu.ops.simple_point import simple_point_batch

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 1 << 26, size=512, dtype=np.uint32)
    bits = ((codes[:, None] >> np.arange(26)[None, :]) & 1).astype(bool)
    py = np.asarray(simple_point_batch(bits))
    cpp = np.asarray([simple_point_native(int(c)) for c in codes])
    np.testing.assert_array_equal(py, cpp)


def _components(mask):
    s26 = ndimage.generate_binary_structure(3, 3)
    _, n = ndimage.label(mask, structure=s26)
    return n


def test_native_thinning_tube():
    shape = (24, 24, 48)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    tube = (((x - 12) ** 2 + (y - 12) ** 2 <= 16)
            & (z >= 4) & (z < 44)).astype(np.uint8)
    skel = skeletonize_native(tube)
    assert _components(skel) == 1
    coords = np.argwhere(skel)
    mid = coords[(coords[:, 2] >= 9) & (coords[:, 2] < 39)]
    assert np.all(np.abs(mid[:, 0] - 12) <= 1)
    assert np.all(np.abs(mid[:, 1] - 12) <= 1)
    assert len(coords) <= 60


def test_native_thinning_preserves_torus_topology():
    shape = (40, 40, 16)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    r = np.sqrt((x - 20) ** 2 + (y - 20) ** 2)
    torus = (((r - 10) ** 2 + (z - 8) ** 2) <= 9).astype(np.uint8)
    skel = skeletonize_native(torus)
    assert _components(skel) == 1
    # keeps the tunnel: there is a cycle
    import networkx as nx
    coords = [tuple(c) for c in np.argwhere(skel)]
    cs = set(coords)
    G = nx.Graph()
    G.add_nodes_from(coords)
    for (a, b, c) in coords:
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if (da, db, dc) != (0, 0, 0) and (a + da, b + db, c + dc) in cs:
                        G.add_edge((a, b, c), (a + da, b + db, c + dc))
    assert len(nx.cycle_basis(G)) >= 1


def test_native_vs_jax_thinning_equivalence_class():
    """Both backends produce valid thin skeletons of the same topology on
    a bent tube (exact voxel sets may differ between sequential and
    subfield-parallel deletion orders)."""
    from arterynetwork_tpu.ops.thinning import skeletonize

    vol = np.zeros((32, 32, 32), np.uint8)
    vol[14:19, 14:19, 4:18] = 1
    vol[14:19, 14:28, 13:18] = 1
    a = skeletonize_native(vol)
    b = np.asarray(skeletonize(vol))
    assert _components(a) == _components(b) == 1
    # both are drastically thinner than the input
    assert a.sum() < vol.sum() * 0.25
    assert b.sum() < vol.sum() * 0.25


def test_nonzero_flat_native_matches_numpy():
    """Word-skipping nonzero scan == np.flatnonzero on sparse volumes,
    across dtypes, alignments (odd tail), and the buffer-regrow path."""
    from arterynetwork_tpu.ops.native import nonzero_flat_native

    rng = np.random.default_rng(7)
    vol = (rng.random((23, 31, 37)) < 0.01)
    for arr in (vol, vol.astype(np.uint8), vol.astype(np.uint8) * 255):
        got = nonzero_flat_native(arr)
        np.testing.assert_array_equal(got, np.flatnonzero(arr))
    # regrow path: expect smaller than the true count
    got = nonzero_flat_native(vol, expect=3)
    np.testing.assert_array_equal(got, np.flatnonzero(vol))
    # empty and dense edges
    assert nonzero_flat_native(np.zeros((4, 4, 5), bool)).size == 0
    dense = np.ones((3, 5, 7), np.uint8)
    np.testing.assert_array_equal(nonzero_flat_native(dense),
                                  np.arange(dense.size))


def test_sparse_argwhere_native_matches_argwhere():
    from arterynetwork_tpu.graphs.segments import _sparse_argwhere

    rng = np.random.default_rng(11)
    vol = (rng.random((19, 45, 33)) < 0.005)
    np.testing.assert_array_equal(_sparse_argwhere(vol), np.argwhere(vol))
    np.testing.assert_array_equal(
        _sparse_argwhere(vol.astype(np.uint8)), np.argwhere(vol))
