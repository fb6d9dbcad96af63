"""Native (C++) EDT / connected-component kernels: parity vs scipy.

These are two of the reference's C-backed host ops rebuilt natively
(scipy distance_transform_edt, generateVesselVolume.py:183; skimage/
scipy label, generateVesselVolume.py:107-136) — SURVEY.md §2 native
accounting items (2) and (3).
"""

import numpy as np
import pytest
from scipy import ndimage

from arterynetwork_tpu.ops.native import (
    drop_small_components_native,
    edt_native,
    label_components_native,
)


@pytest.mark.parametrize("seed,density", [(0, 0.3), (1, 0.6), (2, 0.9)])
def test_edt_native_matches_scipy(seed, density):
    rng = np.random.default_rng(seed)
    m = rng.random((37, 29, 23)) < density
    ours = edt_native(m)
    ref = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_native_squared_exact_ints():
    rng = np.random.default_rng(3)
    m = rng.random((25, 25, 25)) < 0.7
    sq = edt_native(m, squared=True)
    ref = ndimage.distance_transform_edt(m) ** 2
    np.testing.assert_allclose(sq, np.round(ref), atol=1e-3)


def test_edt_native_degenerate():
    assert edt_native(np.zeros((5, 6, 7), bool)).max() == 0
    # all-foreground: no background anywhere -> sentinel plateau
    assert edt_native(np.ones((5, 6, 7), bool)).min() > 1e6


def test_label_components_native_matches_scipy():
    rng = np.random.default_rng(4)
    m = rng.random((30, 31, 32)) < 0.15  # sparse -> many components
    lab, k = label_components_native(m)
    rlab, rk = ndimage.label(m, structure=np.ones((3, 3, 3)))
    assert k == rk
    # identical partition up to renumbering: the (ours, scipy) label
    # pairing over foreground must be a bijection
    pairs = set(zip(lab[m].tolist(), rlab[m].tolist()))
    assert len(pairs) == k
    assert len({a for a, _ in pairs}) == k
    assert len({b for _, b in pairs}) == k
    assert (lab > 0).sum() == m.sum()


def test_drop_small_components_native():
    m = np.zeros((20, 20, 20), bool)
    m[2:4, 2:4, 2:4] = True          # 8 voxels
    m[10:16, 10:16, 10:16] = True    # 216 voxels
    out = drop_small_components_native(m, threshold=50)
    assert out.sum() == 216
    out2 = drop_small_components_native(m, threshold=5)
    assert out2.sum() == 224


def test_drop_small_components_dispatch():
    from arterynetwork_tpu.ops.cc import drop_small_components
    m = np.zeros((16, 16, 16), np.uint8)
    m[1:3, 1:3, 1:3] = 1
    m[8:14, 8:14, 8:14] = 1
    out = drop_small_components(m, threshold=50)
    assert out.dtype == np.uint8
    assert out.sum() == 6 * 6 * 6


def test_vascular_phantom_properties():
    from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                                  vascular_tree_phantom)
    ph = vascular_tree_phantom((128, 128, 64), n_branches=60,
                               root_radius=4.0, branch_length=(10, 25),
                               seed=0)
    m = ph["mask"]
    assert ph["n_branches"] >= 40
    assert 0.001 < m.mean() < 0.1
    # single 26-connected component (flow needs a connected tree)
    _, k = label_components_native(m)
    assert k == 1
    raw = phantom_raw_volume(ph)
    assert raw.shape == m.shape
    assert raw[m].mean() > raw[~m].mean() + 50


@pytest.mark.parametrize("seed,density", [(0, 0.3), (1, 0.6), (2, 0.9)])
def test_edt_masked_matches_scipy_on_foreground(seed, density):
    """Banded sorted-offset EDT: exact at foreground voxels, 0 at
    background (the pipeline's consumers only read foreground)."""
    from arterynetwork_tpu.ops.native import edt_masked_native

    rng = np.random.default_rng(seed)
    m = rng.random((37, 29, 23)) < density
    ours = edt_masked_native(m, r_max=8)
    ref = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(ours[m], ref[m], atol=1e-4)
    assert (ours[~m] == 0).all()


def test_edt_masked_fallback_on_deep_foreground():
    """A voxel deeper than r_max triggers the exact full-transform
    fallback (identical output to edt_native)."""
    from arterynetwork_tpu.ops.native import edt_masked_native

    m = np.ones((11, 11, 11), bool)
    m[0, 0, 0] = False  # single background corner: far voxels exceed r_max
    ours = edt_masked_native(m, r_max=3)
    ref = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(ours[m], ref[m], atol=1e-4)


def test_edt_masked_all_foreground_keeps_sentinel_path():
    """No background at all: fallback to edt_native's sentinel contract."""
    from arterynetwork_tpu.ops.native import edt_masked_native, edt_native

    m = np.ones((6, 7, 8), bool)
    ours = edt_masked_native(m, r_max=4)
    full = edt_native(m)
    np.testing.assert_allclose(ours, full)


def test_edt_masked_border_voxels():
    """Bounds-checked path: volume borders are not background."""
    from arterynetwork_tpu.ops.native import edt_masked_native

    m = np.ones((5, 6, 30), bool)
    m[2, 3, 15] = False
    ours = edt_masked_native(m, r_max=16)
    ref = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(ours[m], ref[m], atol=1e-4)


def test_hysteresis_components_native():
    """Seeded flood fill == keep weak CCs containing strong, > min_size."""
    from arterynetwork_tpu.ops.native import (hysteresis_components_native,
                                              label_components_native)

    rng = np.random.default_rng(0)
    weak = rng.random((30, 32, 34)) < 0.12
    strong = weak & (rng.random(weak.shape) < 0.05)
    min_size = 3
    got = hysteresis_components_native(weak, strong, min_size=min_size)

    labels, k = label_components_native(weak)
    has_strong = np.zeros(k + 1, bool)
    has_strong[np.unique(labels[strong])] = True
    has_strong[0] = False
    sizes = np.bincount(labels.ravel(), minlength=k + 1)
    want = (has_strong & (sizes > min_size))[labels]
    np.testing.assert_array_equal(got.astype(bool), want)


def test_hysteresis_no_strong_clears_everything():
    from arterynetwork_tpu.ops.native import hysteresis_components_native

    weak = np.ones((5, 5, 5), bool)
    strong = np.zeros_like(weak)
    out = hysteresis_components_native(weak, strong)
    assert out.sum() == 0


def test_hysteresis_ds2_matches_full_res():
    """2x-pooled strong seeds select exactly the same components."""
    from arterynetwork_tpu.ops.native import (
        hysteresis_components_ds2_native, hysteresis_components_native)

    rng = np.random.default_rng(7)
    weak = rng.random((21, 22, 23)) < 0.15
    strong = weak & (rng.random(weak.shape) < 0.08)
    full = hysteresis_components_native(weak.copy(), strong, min_size=2)

    z, y, x = weak.shape
    pad = np.zeros(((z + 1) // 2 * 2, (y + 1) // 2 * 2, (x + 1) // 2 * 2),
                   bool)
    pad[:z, :y, :x] = strong
    sds = pad.reshape(pad.shape[0] // 2, 2, pad.shape[1] // 2, 2,
                      pad.shape[2] // 2, 2).any(axis=(1, 3, 5))
    ds = hysteresis_components_ds2_native(weak.copy(), sds, min_size=2)
    np.testing.assert_array_equal(full, ds)


def test_hysteresis_ds2_packed_matches_unpacked():
    """The packed-bit wire entry == the uint8 entry, including non-8-
    multiple totals (tail bits) and an aliased ``out`` scratch."""
    from arterynetwork_tpu.ops.native import (
        hysteresis_components_ds2_native,
        hysteresis_components_ds2_packed_native)

    rng = np.random.default_rng(3)
    out = None
    for shape in [(9, 7, 5), (21, 22, 23), (16, 16, 17)]:
        weak = rng.random(shape) < 0.2
        strong = weak & (rng.random(shape) < 0.1)
        z, y, x = shape
        pad = np.zeros(((z + 1) // 2 * 2, (y + 1) // 2 * 2,
                        (x + 1) // 2 * 2), bool)
        pad[:z, :y, :x] = strong
        sds = pad.reshape(pad.shape[0] // 2, 2, pad.shape[1] // 2, 2,
                          pad.shape[2] // 2, 2).any(axis=(1, 3, 5))
        ref = hysteresis_components_ds2_native(weak.copy(), sds, min_size=2)
        got = hysteresis_components_ds2_packed_native(
            np.packbits(weak.reshape(-1)), shape,
            np.packbits(sds.reshape(-1)), min_size=2, out=out)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(ref, got)
        out = got  # next iteration reuses (and reallocates on mismatch)


def test_pack_mask_round_trip():
    """Device pack_mask bytes == np.packbits of the host mask."""
    import jax.numpy as jnp

    from arterynetwork_tpu.utils.transfer import mask_to_host, pack_mask

    rng = np.random.default_rng(11)
    m = rng.random((7, 9, 11)) < 0.4
    packed = np.asarray(pack_mask(jnp.asarray(m)))
    np.testing.assert_array_equal(packed, np.packbits(m.reshape(-1)))
    np.testing.assert_array_equal(mask_to_host(jnp.asarray(m)), m)


def test_simplify_chains_native_matches_python():
    """graph_ops.cpp simplify == graphs/segments.simplify_chains, chain
    for chain in order (every tie-break mirrored), on a realistic
    thinned phantom skeleton with the full pass stack on."""
    from arterynetwork_tpu.graphs.segments import (
        _chains_from_edges, _edges_from_skeleton, _keys_to_coords,
        simplify_chains)
    from arterynetwork_tpu.ops.native import (chains_from_edges_native,
                                              simplify_chains_native,
                                              skeletonize_native)
    from arterynetwork_tpu.utils.phantoms import vascular_tree_phantom

    ph = vascular_tree_phantom((96, 96, 64), n_branches=30,
                               root_radius=4.0, seed=5)
    skel = np.asarray(skeletonize_native(ph["mask"]), bool)
    from scipy.ndimage import distance_transform_edt
    dt = distance_transform_edt(ph["mask"]).astype(np.float32)

    a, b, shape = _edges_from_skeleton(skel)
    chains, uniq = _chains_from_edges(a, b)
    radius = dt.reshape(-1)[uniq]
    coords = _keys_to_coords(uniq, shape)
    py = simplify_chains(chains, len(uniq), radius, min_length=4,
                         coords=coords.astype(np.float64))
    ai = np.searchsorted(uniq, a)
    bi = np.searchsorted(uniq, b)
    nat = simplify_chains_native(ai, bi, len(uniq), radius,
                                 coords=coords, min_length=4)
    assert [list(c) for c in py] == [list(c) for c in nat]

    # the plain walk matches too (order included)
    walk_py = _chains_from_edges(a, b)[0]
    walk_nat = chains_from_edges_native(ai, bi, len(uniq))
    assert [list(c) for c in walk_py] == [list(c) for c in walk_nat]
