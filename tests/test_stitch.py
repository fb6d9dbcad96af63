"""Overlapping-scan stitcher tests (getBoundary/mergeVolume parity,
manualCorrectionGUI.py:31-66)."""

import numpy as np

from arterynetwork_tpu.io.stitch import get_boundary, merge_volume, stitch_scans


def _reference_get_boundary(dataVolume, axis, flipAxis=False):
    # Literal transcription of manualCorrectionGUI.py:31-57 (oracle).
    shape = np.array(dataVolume.shape)
    mask = dataVolume != 0
    if flipAxis:
        return shape[axis] - np.flip(mask, axis=axis).argmax(axis=axis) - 1
    return np.argmax(mask, axis=axis)


def test_get_boundary_matches_reference_semantics():
    rng = np.random.default_rng(0)
    vol = (rng.random((6, 7, 8)) > 0.7).astype(np.uint8)
    vol[:, 2, :] = 0  # all-zero lines exercise the argmax==0 convention
    for axis in range(3):
        for flip in (False, True):
            np.testing.assert_array_equal(
                get_boundary(vol, axis, flip),
                _reference_get_boundary(vol, axis, flip))


def test_merge_volume_axis0_matches_reference():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 5, (6, 5, 4))
    b = rng.integers(0, 5, (6, 5, 4))
    lower = rng.integers(0, 3, (5, 4))
    upper = lower + rng.integers(0, 3, (5, 4))

    # Reference mergeVolume (manualCorrectionGUI.py:59-66), axis 0.
    ref_dst = b.copy()
    index_volume = np.array([np.logical_and(ii >= lower, ii <= upper)
                             for ii in range(a.shape[0])])
    ref_dst[index_volume] = a[index_volume]

    dst = b.copy()
    got_index = merge_volume(a, dst, lower, upper, axis=0)
    np.testing.assert_array_equal(dst, ref_dst)
    np.testing.assert_array_equal(got_index, index_volume)


def test_merge_volume_scalar_bounds_any_axis():
    a = np.ones((4, 4, 4), int)
    for axis in range(3):
        dst = np.zeros((4, 4, 4), int)
        merge_volume(a, dst, 1, 2, axis=axis)
        sl = [slice(None)] * 3
        sl[axis] = slice(1, 3)
        expect = np.zeros((4, 4, 4), int)
        expect[tuple(sl)] = 1
        np.testing.assert_array_equal(dst, expect)


def test_stitch_scans_overlap_prefers_first_scan():
    # scan_a occupies z<=6, scan_b occupies z>=4: overlap [4,6] must come
    # from scan_a; outside the overlap each scan survives where the other
    # is empty.
    a = np.zeros((3, 3, 10), int)
    b = np.zeros((3, 3, 10), int)
    a[..., :7] = 1
    b[..., 4:] = 2
    merged = stitch_scans(a, b, axis=2)
    assert (merged[..., :7] == 1).all()
    assert (merged[..., 7:] == 2).all()
