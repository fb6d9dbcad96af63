"""EDT and connected-component parity tests against scipy."""

import numpy as np
import pytest
from scipy import ndimage

from arterynetwork_tpu.ops.cc import (
    connected_components,
    drop_small_components,
    label_volume,
)
from arterynetwork_tpu.ops.edt import edt, edt_squared


def _random_mask(shape, p, seed):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < p).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1])
def test_edt_exact_matches_scipy(seed):
    mask = _random_mask((24, 20, 28), 0.7, seed)
    ours = np.asarray(edt(mask, band=None))
    ref = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_banded_exact_within_band():
    """Banded EDT is exact where the distance <= band (vessel radii)."""
    mask = np.zeros((40, 40, 40), np.uint8)
    mask[8:32, 8:32, 8:32] = 1  # cube: max interior distance 12
    ours = np.asarray(edt(mask, band=16))
    ref = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_vessel_radius_recovery():
    """Radius from EDT at the centerline equals the tube radius
    (the reference's radius recovery, manualCorrectionGUI.py:376-377)."""
    shape = (30, 30, 60)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    tube = ((x - 15) ** 2 + (y - 15) ** 2 <= 5 ** 2).astype(np.uint8)
    d = np.asarray(edt(tube, band=16))
    centerline = d[15, 15, 10:50]
    ref = ndimage.distance_transform_edt(tube)[15, 15, 10:50]
    np.testing.assert_allclose(centerline, ref, atol=1e-4)


def test_edt_anisotropic_sampling():
    mask = _random_mask((16, 18, 20), 0.6, 3)
    ours = np.asarray(edt(mask, band=None, sampling=(1.0, 2.0, 0.5)))
    ref = ndimage.distance_transform_edt(mask, sampling=(1.0, 2.0, 0.5))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("connectivity", [1, 3])
def test_connected_components_match_scipy(connectivity):
    mask = _random_mask((20, 22, 18), 0.2, 7)
    ours = np.asarray(connected_components(mask, connectivity=connectivity))
    structure = (ndimage.generate_binary_structure(3, 1) if connectivity == 1
                 else ndimage.generate_binary_structure(3, 3))
    ref, n_ref = ndimage.label(mask, structure=structure)
    # same partition: count components and check label-set bijection
    assert len(np.unique(ours)) - 1 == n_ref
    for lab in range(1, n_ref + 1):
        ours_labels = np.unique(ours[ref == lab])
        assert len(ours_labels) == 1


def test_label_volume_sizes():
    vol = np.zeros((16, 16, 16), np.uint8)
    vol[2:4, 2:4, 2:4] = 1        # 8 voxels
    vol[10:14, 10:14, 10:14] = 1  # 64 voxels
    labeled, result = label_volume(vol, min_size=1)
    sizes = sorted(s for l, s in result if l != 0)
    assert sizes == [8, 64]


def test_drop_small_components():
    vol = np.zeros((16, 16, 16), np.uint8)
    vol[2:4, 2:4, 2:4] = 1        # 8 voxels -> dropped
    vol[8:14, 8:14, 8:14] = 1     # 216 voxels -> kept
    out = drop_small_components(vol, threshold=150)
    assert out[2:4, 2:4, 2:4].sum() == 0
    assert out[8:14, 8:14, 8:14].sum() == 216
