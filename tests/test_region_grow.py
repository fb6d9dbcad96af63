"""Region-growing parity tests.

The straight-line and sphere phantoms are the reference's own (commented
out) unit tests (variationalRegionGrowing.py:284-314): seed inside the
shape, grow, require the segmented voxel set to equal the shape exactly.
"""

import numpy as np

from arterynetwork_tpu.ops.region_grow import (
    region_grow,
    region_grow_value_map,
    reconstruct_value_map,
)


def test_straight_line_phantom():
    """variationalRegionGrowing.py:284-298 — 2x2x20 bar in a 50x50x150
    volume, seeded with a 2x2x3 slab; exact voxel parity required."""
    volume = np.zeros((50, 50, 150), dtype=np.int32)
    volume[20:22, 20:22, 20:40] = 1
    seed = np.zeros_like(volume, dtype=bool)
    seed[20:22, 20:22, 22:25] = True

    res = region_grow(volume.astype(np.float32), seed)
    seg = np.asarray(res.segmented_map)
    assert int(res.stop_reason) == 0, "should converge (no flips)"
    assert seg.sum() == np.count_nonzero(volume)
    np.testing.assert_array_equal(seg, volume.astype(bool))


def test_sphere_phantom():
    """variationalRegionGrowing.py:300-314 — radius-10 sphere, seeded with
    a 2x2x2 block at the center; exact voxel parity required."""
    x, y, z = np.mgrid[:50, :50, :50]
    volume = ((x - 25) ** 2 + (y - 25) ** 2 + (z - 25) ** 2 <= 100)
    volume = volume.astype(np.int32)
    seed = np.zeros_like(volume, dtype=bool)
    seed[25:27, 25:27, 25:27] = True

    res = region_grow(volume.astype(np.float32), seed)
    seg = np.asarray(res.segmented_map)
    assert int(res.stop_reason) == 0
    assert seg.sum() == np.count_nonzero(volume)
    np.testing.assert_array_equal(seg, volume.astype(bool))


def test_max_segment_size_cap():
    """The size cap returns the pre-update state (reference :101-104)."""
    volume = np.zeros((30, 30, 60), dtype=np.int32)
    volume[10:14, 10:14, 5:55] = 1  # 4*4*50 = 800 voxels
    seed = np.zeros_like(volume, dtype=bool)
    seed[10:14, 10:14, 28:31] = True

    res = region_grow(volume.astype(np.float32), seed, max_segment_size=100)
    assert int(res.stop_reason) == 1
    assert int(res.segmented_count) >= 100
    # growth stopped well before filling the bar
    assert int(res.segmented_count) < 800


def test_value_map_api():
    """Reference-style valueMap in / (coords, segmentedMap, valueMap) out."""
    volume = np.zeros((20, 20, 40), dtype=np.int32)
    volume[8:10, 8:10, 5:35] = 1
    value_map = np.full(volume.shape, 3)
    value_map[8:10, 8:10, 15:18] = 0

    coords, seg_map, vm = region_grow_value_map(volume, value_map)
    assert coords.shape[1] == 3
    assert seg_map.sum() == np.count_nonzero(volume)
    # valueMap encoding: segmented voxels are 0/1, everything else 2/3/4
    assert set(np.unique(vm[seg_map == 1])) <= {0, 1}
    assert set(np.unique(vm[seg_map == 0])) <= {2, 3, 4}
    # inner boundary voxels (state 1) are segmented voxels with an
    # unsegmented neighbor: the whole 2x2 bar cross-section qualifies
    assert np.all(vm[volume.astype(bool)] == 1)


def test_excluded_voxels_stay_out_of_outer_stats():
    """State-4 voxels beyond the front's reach never enter the outer
    region; ones the front touches convert (reference 4->3 dynamics)."""
    volume = np.zeros((20, 20, 20), dtype=np.int32)
    volume[8:12, 8:12, 4:16] = 1
    seed = np.zeros_like(volume, dtype=bool)
    seed[9:11, 9:11, 9:11] = True
    excluded = np.zeros_like(volume, dtype=bool)
    excluded[:2] = True  # a far-away excluded slab

    res = region_grow(volume.astype(np.float32), seed,
                      excluded_mask=excluded)
    active = np.asarray(res.active_map)
    assert not active[:2].any(), "untouched excluded voxels stay excluded"
    seg = np.asarray(res.segmented_map)
    np.testing.assert_array_equal(seg, volume.astype(bool))


def test_h_parameter_controls_growth():
    """Larger H -> smaller segmentation (reference docstring, :23)."""
    rng = np.random.default_rng(0)
    volume = rng.normal(0.2, 0.05, size=(24, 24, 24)).astype(np.float32)
    volume[8:16, 8:16, 8:16] += 0.6
    seed = np.zeros(volume.shape, dtype=bool)
    seed[11:13, 11:13, 11:13] = True

    small_h = region_grow(volume, seed, H=0.5, num_bins=512)
    large_h = region_grow(volume, seed, H=50.0, num_bins=512)
    assert int(small_h.segmented_count) >= int(large_h.segmented_count)


def test_fixed_point_parity_with_reference_protocol():
    """The TPU kernel and the faithful boundary-list implementation reach
    the same converged voxel set (parity at fixed point, SURVEY.md)."""
    from arterynetwork_tpu.utils.reference_region_grow import (
        reference_region_grow)

    rng = np.random.default_rng(5)
    volume = np.zeros((16, 16, 32), dtype=np.float32)
    volume[6:9, 6:9, 4:28] = 1.0
    volume += rng.normal(0, 0.01, volume.shape).astype(np.float32)
    seed = np.zeros(volume.shape, bool)
    seed[7, 7, 14:18] = True

    ref_seg, _, _ = reference_region_grow(volume, seed)
    res = region_grow(volume, seed, num_bins=1024)
    ours = np.asarray(res.segmented_map)
    np.testing.assert_array_equal(ours, ref_seg)
