"""End-to-end pipeline tests (BASELINE config-3 mini pipeline)."""

import numpy as np
import pytest

from arterynetwork_tpu.config import PipelineConfig
from arterynetwork_tpu.io.artifacts import ArtifactStore
from arterynetwork_tpu.pipeline import (
    generate_vessel_mask,
    run_pipeline,
)


def _y_phantom(shape=(48, 48, 64), noise=0.02, seed=0):
    """Y-shaped bright vessel on a dim noisy background (intensities set
    with max so overlapping strokes do not stack)."""
    rng = np.random.default_rng(seed)
    vol = rng.normal(0.05, noise, shape).astype(np.float32)
    tube = np.zeros(shape, bool)
    for z in range(8, 34):
        tube[21:28, 21:28, z] = True
    for i in range(20):
        a = 24 + i // 2
        b = 24 - i // 2
        z = 33 + i
        tube[a - 2:a + 3, a - 2:a + 3, z] = True
        tube[b - 2:b + 3, b - 2:b + 3, z] = True
    vol[tube] = 0.9 + 0.05 * rng.random(tube.sum()).astype(np.float32)
    return vol


def test_generate_vessel_mask_thresholds():
    vol = _y_phantom()
    brain = np.ones(vol.shape, np.uint8)
    mask = generate_vessel_mask(vol, brain_mask=brain)
    assert mask.sum() > 500
    # mask only covers bright voxels
    assert vol[mask.astype(bool)].min() > 0.5


def test_full_pipeline_on_phantom(tmp_path):
    vol = _y_phantom()
    seed = np.zeros(vol.shape, bool)
    seed[23:26, 23:26, 18:21] = True
    store = ArtifactStore(str(tmp_path))
    cfg = PipelineConfig()
    cfg.segmentation.max_segment_size = 50000
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4

    result = run_pipeline(vol, seed_mask=seed, config=cfg, store=store)
    assert result["mask"].sum() > 500
    assert 0 < result["skeleton"].sum() < result["mask"].sum() * 0.25
    assert len(result["segments"]) >= 3
    net = result["network"]
    assert net.num_edges >= 3
    sol = result["solution"]
    assert np.isfinite(np.asarray(sol.pressure)).all()
    assert float(np.asarray(sol.residual_norm)) < 1e-10
    # flows conserve: total inlet flow == sum of terminal flows
    flows = np.asarray(sol.flow)
    term = net.terminal_nodes()
    deg = net.degree
    inlet_edges = [e for e in range(net.num_edges)
                   if net.heads[e] in set(net.entry_nodes.tolist())]
    term_edges = [e for e in range(net.num_edges)
                  if net.tails[e] in set(term.tolist())]
    np.testing.assert_allclose(flows[inlet_edges].sum(),
                               flows[term_edges].sum(), rtol=1e-9)

    # artifacts written with the reference's names
    for name in ("vesselVolumeMask.nii.gz", "skeleton.nii.gz",
                 "segmentList.npz",
                 "graphRepresentationCleanedWithEdgeInfo.graphml",
                 "fluidSimulationResult.pkl"):
        if name == "vesselVolumeMask.nii.gz":
            continue  # only written by generate_vessel_mask path
        assert store.exists(name), name

    # timings recorded per stage
    assert set(result["timings"]) == {
        "segmentation", "edt", "skeletonization", "graph", "flow"}


def test_full_extent_mask_survives_native_thinning():
    """A mask whose bounding box spans the full volume must come back
    intact: the box crop is then a view of the mask itself, and the
    in-place clobbering thinning would otherwise overwrite
    result['mask'] with the skeleton."""
    shape = (24, 28, 32)
    v = np.zeros(shape, np.float32)
    # three tubes meeting at a corner, each spanning its full axis, so
    # bounding_box returns the whole volume and the crop is a view
    v[:, 2:6, 2:6] = 1.0
    v[2:6, :, 2:6] = 1.0
    v[2:6, 2:6, :] = 1.0
    cfg = PipelineConfig()
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.weak_threshold_fraction = None
    cfg.segmentation.border_margin_voxels = 0
    cfg.segmentation.min_component_size = 1
    cfg.skeleton.backend = "native"
    result = run_pipeline(vesselness=v, config=cfg)
    mask_voxels = int(result["mask"].sum())
    skel_voxels = int(result["skeleton"].sum())
    assert mask_voxels == int((v >= 0.3).sum())
    assert 0 < skel_voxels < mask_voxels


def test_pipeline_from_raw_volume(tmp_path):
    """Raw MRA entry point: vesselness computed in-framework (the
    reference requires external 3D Slicer preprocessing here)."""
    shape = (40, 40, 56)
    rng = np.random.default_rng(2)
    raw = rng.normal(100.0, 3.0, shape).astype(np.float32)
    x, y = np.mgrid[: shape[0], : shape[1]]
    tube = ((x - 20) ** 2 + (y - 20) ** 2 <= 3 ** 2)
    for z in range(6, 50):
        raw[:, :, z] += 120.0 * tube

    store = ArtifactStore(str(tmp_path))
    cfg = PipelineConfig()
    cfg.vesselness.sigmas = (2.0, 3.0)
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.min_component_size = 20
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4

    result = run_pipeline(raw_volume=raw, config=cfg, store=store)
    assert store.exists("vesselnessFiltered.nii.gz")
    assert result["mask"].sum() > 100
    assert len(result["segments"]) >= 1
    assert "vesselness" in result["timings"]
    assert np.isfinite(np.asarray(result["solution"].pressure)).all()


def test_soa_flow_path_matches_nx_path():
    """The SoA fast path (segments+attrs -> FlowNetwork) produces the
    same network as the networkx route on a tree-like skeleton."""
    import numpy as np

    from arterynetwork_tpu.pipeline import (flow_stage, flow_stage_soa,
                                            graph_stage)

    vol = _y_phantom()
    mask = (vol > 0.5).astype(np.uint8)
    from arterynetwork_tpu.pipeline import compute_mask_edt, \
        skeletonize_stage
    cfg = PipelineConfig()
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4
    cfg.flow.dtype = "float64"
    dt = compute_mask_edt(mask)
    skel = skeletonize_stage(mask, cfg, distance_transform=dt)
    G, segments, attrs = graph_stage(skel, mask, cfg,
                                     distance_transform=dt, build_nx=True)
    counts = {}
    for seg in segments:
        for v in (tuple(seg[0]), tuple(seg[-1])):
            counts[v] = counts.get(v, 0) + 1
    root = min((v for v, c in counts.items() if c == 1),
               key=lambda v: v[2])

    net_nx, sol_nx, of_nx = flow_stage(G, segments, root, cfg)
    net_soa, sol_soa, of_soa = flow_stage_soa(segments, attrs, root, cfg)

    assert net_nx.num_nodes == net_soa.num_nodes
    assert net_nx.num_edges == net_soa.num_edges

    def edge_set(net, node_of):
        coord_of = {i: c for c, i in node_of.items()}
        out = set()
        for e in range(net.num_edges):
            a = coord_of[int(net.heads[e])]
            b = coord_of[int(net.tails[e])]
            out.add((a, b, round(float(net.radius[e]), 6),
                     round(float(net.length[e]), 6)))
        return out
    assert edge_set(net_nx, of_nx) == edge_set(net_soa, of_soa)
    # same physics: pressures agree at matching coordinates
    p_nx = {c: float(np.asarray(sol_nx.pressure)[i])
            for c, i in of_nx.items()}
    p_soa = {c: float(np.asarray(sol_soa.pressure)[i])
             for c, i in of_soa.items()}
    for c in p_nx:
        assert abs(p_nx[c] - p_soa[c]) < 1e-6 * max(abs(p_nx[c]), 1.0)


def test_graph_stage_box_coordinates_match_full_frame():
    """The box-cropped (origin-shifted) fast path produces the same
    segments and branch attributes as the full-frame path."""
    from arterynetwork_tpu.ops.native import (bounding_box,
                                              edt_masked_native,
                                              skeletonize_native_cropped)
    from arterynetwork_tpu.pipeline import compute_mask_edt, graph_stage

    rng = np.random.default_rng(7)
    mask = np.zeros((40, 48, 36), bool)
    # a few tubes far from the volume origin so origin != (0, 0, 0)
    mask[12:15, 20:23, 6:30] = True
    mask[12:30, 20:23, 14:17] = True
    mask[25:28, 8:32, 15:18] = True

    box = bounding_box(mask, margin=2)
    origin = tuple(int(s.start) for s in box)
    assert any(origin)
    mask_box = np.ascontiguousarray(mask[box], np.uint8)
    d2_box = edt_masked_native(mask_box, squared=True)
    skel_box = skeletonize_native_cropped(mask_box, d2_box)

    skel_full = np.zeros(mask.shape, bool)
    skel_full[box] = skel_box
    dt_full = compute_mask_edt(mask)

    cfg = PipelineConfig()
    _, seg_box, attrs_box = graph_stage(
        skel_box, mask, cfg, distance_transform=np.sqrt(d2_box),
        build_nx=False, origin=origin)
    _, seg_full, attrs_full = graph_stage(
        skel_full, mask, cfg, distance_transform=dt_full, build_nx=False)

    canon = lambda segs: sorted(
        min(tuple(s), tuple(reversed(s)))
        for s in (tuple(map(tuple, x)) for x in segs))
    assert canon(seg_box) == canon(seg_full)
    for a, b in zip(attrs_box, attrs_full):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-12)


def test_tip_extension_recovers_axial_tips_only():
    """_tip_extended_weak: voxels above the tip floor beyond a vessel
    end (few mask neighbors) join the mask; voxels beside a thick
    vessel face (many neighbors) and isolated voxels do not."""
    from arterynetwork_tpu.config import PipelineConfig
    from arterynetwork_tpu.pipeline import generate_vessel_mask

    shape = (32, 32, 48)
    rng = np.random.default_rng(1)
    v = rng.random(shape).astype(np.float32) * 0.004
    v[16, 16, 8:30] = 1.0                # thin vessel (weak+strong pass)
    v[16, 16, 30:33] = 0.02              # fading tip: below weak floor,
    #                                      above the tip floor
    v[4:11, 4:11, 8:30] = 1.0            # thick vessel
    v[4:11, 12, 18] = 0.02               # lateral halo beside its face
    v[28, 28, 40] = 0.02                 # isolated voxel (no neighbor)

    cfg = PipelineConfig()
    cfg.segmentation.weak_threshold_fraction = 0.05
    cfg.segmentation.global_threshold_fraction = 0.5
    cfg.segmentation.min_component_size = 5
    # copy: generate_vessel_mask reuses a cached scratch frame across
    # calls (pipeline._mask_scratch), so the next call writes over it
    base = generate_vessel_mask(v, config=cfg).copy()
    assert not base[16, 16, 30:33].any()         # tip lost without it

    cfg.segmentation.tip_fraction = 0.01
    cfg.segmentation.tip_iters = 3
    cfg.segmentation.tip_neighbor_max = 4
    mask = generate_vessel_mask(v, config=cfg)
    assert mask[16, 16, 30:33].all()             # axial tip recovered
    assert not mask[4:11, 12, 18].any()          # thick-face halo blocked
    assert not mask[28, 28, 40]                  # isolated: never grown
    # nothing else changed
    assert (mask.astype(bool) ^ base.astype(bool)).sum() == 3


def test_hysteresis_mask_with_brain_boundary_suppression():
    """Hysteresis + brain mask: near-boundary low responses are zeroed
    (generateVesselVolume.py:186-191 semantics) while interior vessels
    survive through the weak floor."""
    from arterynetwork_tpu.config import PipelineConfig
    from arterynetwork_tpu.pipeline import generate_vessel_mask

    shape = (40, 40, 48)
    rng = np.random.default_rng(0)
    v = rng.random(shape).astype(np.float32) * 0.02
    v[18:22, 18:22, 8:40] = 1.0          # interior vessel
    v[2:5, 18:22, 8:40] = 0.5            # mid response near brain edge
    brain = np.zeros(shape, np.uint8)
    brain[2:38, 2:38, 2:46] = 1

    cfg = PipelineConfig()
    cfg.segmentation.weak_threshold_fraction = 0.05
    cfg.segmentation.global_threshold_fraction = 0.7
    cfg.segmentation.near_boundary_fraction = 0.8
    cfg.segmentation.boundary_distance_voxels = 6.0
    cfg.segmentation.min_component_size = 10
    mask = generate_vessel_mask(v, brain_mask=brain, config=cfg)
    assert mask[18:22, 18:22, 10:38].all()       # vessel kept
    assert not mask[2:5, 18:22, 8:40].any()      # boundary band suppressed

    # same volume without the brain mask keeps the boundary structure
    # if it connects to a strong seed; the band structure here has no
    # strong voxel of its own, so it still dies to hysteresis — check
    # the plain-threshold variant instead keeps it
    cfg2 = PipelineConfig()
    cfg2.segmentation.weak_threshold_fraction = 0.05
    cfg2.segmentation.global_threshold_fraction = 0.4
    cfg2.segmentation.min_component_size = 10
    mask2 = generate_vessel_mask(v, config=cfg2)
    assert mask2[2:5, 18:22, 10:38].any()


def test_full_pipeline_bq4_upload_skip(tmp_path):
    """The bench wire config (bq4 + occupancy-skipped upload + hysteresis
    + batched sparse mask download) runs end to end and recovers the
    phantom: integration cover for the sparse upload/download paths the
    default u12 config bypasses."""
    vol = _y_phantom() * 200.0 + 100.0  # MRA-like absolute intensities
    seed = np.zeros(vol.shape, bool)
    seed[23:26, 23:26, 18:21] = True
    cfg = PipelineConfig()
    cfg.vesselness.upload_format = "bq4"
    assert cfg.vesselness.upload_skip  # default on
    cfg.segmentation.max_segment_size = 50000
    cfg.segmentation.weak_threshold_fraction = 0.03
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.min_component_size = 50
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4

    result = run_pipeline(vol, seed_mask=seed, config=cfg)
    assert result["mask"].sum() > 500
    assert len(result["segments"]) >= 3
    assert np.isfinite(np.asarray(result["solution"].pressure)).all()
