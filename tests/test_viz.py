"""Visualization smoke tests (figures build, files write)."""

import os

import numpy as np

from arterynetwork_tpu.flow import create_ground_truth
from arterynetwork_tpu.flow.adan import set_network_ck
from arterynetwork_tpu.graphs import generate_tree, set_network_properties
from arterynetwork_tpu.viz import (
    box_plot_whiskers,
    generate_colormap,
    line_plot_binned,
    plot_flow_per_compartment,
    plot_network,
    plot_root_pressure_over_time,
    plot_terminating_pressure_distribution,
    plot_tp_vs_path_length,
)


def _solved_net(seed=0):
    rng = np.random.default_rng(seed)
    net = set_network_ck(set_network_properties(
        generate_tree(max_depth=5, rng=rng), rng=rng))
    gt = create_ground_truth(net, option=2, rng=rng)
    return net, gt


def _partitions(net):
    roots = np.nonzero(net.node_depth == 1)[0]
    return {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
            for i, r in enumerate(roots)}


def test_plot_network_writes_png(tmp_path):
    net, gt = _solved_net()
    p = str(tmp_path / "net.png")
    fig = plot_network(net, node_values=gt.pressure, edge_values=gt.flow,
                       title="test", path=p)
    assert os.path.exists(p) and os.path.getsize(p) > 1000
    assert len(fig.axes) >= 1


def test_result_dashboards(tmp_path):
    net, gt = _solved_net(1)
    parts = _partitions(net)
    f1 = plot_terminating_pressure_distribution(
        net, gt.pressure, parts, path=str(tmp_path / "tp.png"))
    f2 = plot_flow_per_compartment(
        net, gt.flow, parts, path=str(tmp_path / "flow.png"))
    f3 = plot_tp_vs_path_length(
        net, gt.pressure, parts, path=str(tmp_path / "tppl.png"))
    f4 = plot_root_pressure_over_time(
        np.stack([gt.pressure, gt.pressure * 0.98]), [0],
        path=str(tmp_path / "root.png"))
    for name in ("tp.png", "flow.png", "tppl.png", "root.png"):
        assert os.path.getsize(str(tmp_path / name)) > 1000


def test_helpers():
    import matplotlib.pyplot as plt

    cm = generate_colormap(np.linspace(0, 1, 16))
    assert cm.shape == (16, 4)
    assert (cm >= 0).all() and (cm <= 1).all()

    fig, ax = plt.subplots()
    stat = line_plot_binned(np.arange(100), np.arange(100) ** 2, ax, bins=8)
    assert np.isfinite(stat).all()
    fig2, ax2 = plt.subplots()
    box_plot_whiskers([np.random.default_rng(0).random(20)
                       for _ in range(3)], ax2)


def test_skeleton_overlay(tmp_path):
    from arterynetwork_tpu.viz.network_plot import plot_skeleton_overlay

    segs = [[(i, 10, 10) for i in range(12)],
            [(11, 10, 10), (12, 11, 11), (13, 12, 12)]]
    values = {v: float(v[0]) for s in segs for v in s}
    p = str(tmp_path / "overlay.png")
    plot_skeleton_overlay(segs, values, value_name="pressure", path=p)
    assert os.path.getsize(p) > 1000


# ----------------------------------------------------------------------
# study-plot suite (statistics per partition, fig1-fig18, GBMTest5
# composite — graphRelated.py:662-1565, fluidSimulation.py:3838-4004)
# ----------------------------------------------------------------------
def _partitioned_voxel_net():
    """Two-compartment voxel tree with branch attrs, partition labels and
    curvature fields."""
    from arterynetwork_tpu.graphs.branch_attrs import calculate_branch_info
    from arterynetwork_tpu.graphs.partitioning import partition_compartments
    from arterynetwork_tpu.morpho.curvature import calculate_curvature
    from arterynetwork_tpu.morpho.metrics import calculate_property

    def chain(start, step, n):
        return [(start[0] + step[0] * i, start[1] + step[1] * i,
                 start[2] + step[2] * i) for i in range(n)]

    trunk = chain((10, 20, 4), (0, 0, 1), 8)      # root chain
    j1 = trunk[-1]
    left = [j1] + chain((10, 21, 12), (0, 1, 1), 7)
    right = [j1] + chain((10, 19, 12), (0, -1, 1), 7)
    j2 = left[-1]
    l1 = [j2] + chain((10, 28, 20), (1, 1, 1), 6)
    l2 = [j2] + chain((10, 28, 20), (-1, 1, 1), 6)
    segments = [trunk, left, right, l1, l2]
    dt = np.full((40, 40, 40), 2.0, np.float32)
    G = calculate_branch_info(segments, segments, distance_transform=dt)
    chosen = {"LMCA": {"initial_voxels": [left[1]]},
              "RMCA": {"initial_voxels": [right[1]]}}
    # BFS from the root first so depth attrs exist graph-wide
    from arterynetwork_tpu.graphs.traversal import partition_bfs
    partition_bfs(G, [trunk[0]], [])
    partition_info = partition_compartments(G, segments, chosen)
    node_info, seg_info = calculate_property(G, segments, min_nodes=3)
    parts_curv = {
        name: {"initial_voxels": chosen[name]["initial_voxels"],
               "boundary_voxels": [],
               "visited_voxels": info["visited_voxels"],
               "segment_index_list": info["segment_index_list"]}
        for name, info in partition_info.items()}
    seg_info = calculate_curvature(G, seg_info, parts_curv,
                                   spacing_factor_mm=0.4)
    return G, segments, partition_info, node_info, seg_info


def test_statistics_per_partition():
    from arterynetwork_tpu.viz import (statistics_per_partition,
                                       statistics_per_partition2)
    G, segments, partition_info, _, _ = _partitioned_voxel_net()
    stats = statistics_per_partition(G, segments, partition_info)
    assert set(stats) == {"Overall", "LMCA", "RMCA"}
    assert stats["Overall"]["numBranches"] >= 4
    assert stats["LMCA"]["meanRadius"]["n"] > 0
    stats2 = statistics_per_partition2(G, segments, partition_info)
    assert set(stats2) == {"PCA", "MCA", "ACA"}
    assert stats2["MCA"]["numBranches"] > 0


def test_figure_suite_renders(tmp_path):
    import arterynetwork_tpu.viz as viz
    G, segments, partition_info, node_info, seg_info = \
        _partitioned_voxel_net()
    for name in ("fig1", "fig2", "fig3", "fig4", "fig5", "fig6",
                 "fig11", "fig11b", "fig12", "fig13", "fig18"):
        p = str(tmp_path / f"{name}.png")
        fig = getattr(viz, name)(seg_info, node_info, path=p)
        assert os.path.exists(p) and os.path.getsize(p) > 1000, name


def test_show_result_gbm_test5(tmp_path):
    import jax.numpy as jnp

    from arterynetwork_tpu.flow import (create_ground_truth,
                                        save_gbm_test5_results)
    from arterynetwork_tpu.flow.longitudinal import run_longitudinal
    from arterynetwork_tpu.io.artifacts import ArtifactStore
    from arterynetwork_tpu.viz import show_result_gbm_test5

    net, gt = _solved_net(2)
    parts = _partitions(net)
    radius_end = net.radius * 0.9
    batch, sol = run_longitudinal(net, gt.pressure, radius_end,
                                  num_timesteps=3, partitions=parts,
                                  dtype=jnp.float64)
    store = ArtifactStore(str(tmp_path))
    save_gbm_test5_results(store, net, batch, sol)
    out = show_result_gbm_test5(store, net, num_timesteps=3,
                                partitions=parts, out_dir=str(tmp_path))
    assert out["terminating_pressures_mmhg"].shape[1] == 3
    assert np.isfinite(out["terminating_pressures_mmhg"]).all()
    for t in range(3):
        f = str(tmp_path / f"gbm5_network_t{t}.png")
        assert os.path.exists(f) and os.path.getsize(f) > 1000
    for o in (1, 2):
        assert os.path.getsize(str(tmp_path / f"gbm5_tp_option{o}.png")) > 1000


def test_show_result2_gbm_test5(tmp_path):
    """showResult2_GBMTest5 (fluidSimulation.py:3926-4004): two
    timesteps rendered with shared scales + one standalone legend."""
    import jax.numpy as jnp

    from arterynetwork_tpu.flow import save_gbm_test5_results
    from arterynetwork_tpu.flow.longitudinal import run_longitudinal
    from arterynetwork_tpu.io.artifacts import ArtifactStore
    from arterynetwork_tpu.viz import show_result2_gbm_test5

    net, gt = _solved_net(2)
    parts = _partitions(net)
    batch, sol = run_longitudinal(net, gt.pressure, net.radius * 0.9,
                                  num_timesteps=3, partitions=parts,
                                  dtype=jnp.float64)
    store = ArtifactStore(str(tmp_path))
    save_gbm_test5_results(store, net, batch, sol)
    out = show_result2_gbm_test5(store, net, timesteps=(0, 2),
                                 out_dir=str(tmp_path))
    assert out["timesteps"] == [0, 2]
    lo, hi = out["node_range_mmhg"]
    assert np.isfinite([lo, hi]).all() and lo <= hi
    for t in (0, 2):
        f = str(tmp_path / f"gbm5_compare_t{t}.png")
        assert os.path.exists(f) and os.path.getsize(f) > 1000
    assert os.path.getsize(str(tmp_path / "gbm5_compare_legend.png")) > 1000
    # hidden in-figure colorbars: the two plots must have exactly 1 axes
    assert all(len(f.axes) == 1 for f in out["figures"][:2])


def test_graph_plot_per_partition_variants(tmp_path):
    """graphPlotPerPartition / graphPlotPerPartition2 parity drivers
    (graphRelated.py:1635-1718): per-compartment reduced-graph plots
    colored by Murray's-law ratio (nodes) and radius (edges), the second
    variant with one shared colorbar pair."""
    from arterynetwork_tpu.viz import graph_plot_per_partition

    G, segments, partition_info, node_info, seg_info = \
        _partitioned_voxel_net()
    p1 = str(tmp_path / "per_part.png")
    fig1_ = graph_plot_per_partition(G, segments, seg_info, node_info,
                                     partition_info, path=p1)
    assert os.path.getsize(p1) > 1000
    assert len(fig1_.axes) == len(partition_info)

    p2 = str(tmp_path / "per_part_shared.png")
    fig2_ = graph_plot_per_partition(G, segments, seg_info, node_info,
                                     partition_info, shared_colorbar=True,
                                     path=p2)
    assert os.path.getsize(p2) > 1000
    # panels + 2 shared colorbars
    assert len(fig2_.axes) == len(partition_info) + 2

    # the named second variant (graphRelated.py:1672)
    from arterynetwork_tpu.viz import graph_plot_per_partition2

    p3 = str(tmp_path / "per_part2.png")
    fig3_ = graph_plot_per_partition2(G, segments, seg_info, node_info,
                                      partition_info, path=p3)
    assert os.path.getsize(p3) > 1000
    assert len(fig3_.axes) == len(partition_info) + 2


def test_load_basic_files_bundle(tmp_path):
    """load_basic_files (graphRelated.py:433-515): one call returns the
    full morphology bundle under the reference's file names."""
    import pytest as _pytest

    from arterynetwork_tpu.graphs.partitioning import save_partition
    from arterynetwork_tpu.io.artifacts import ArtifactStore, \
        load_basic_files

    G, segments, partition_info, node_info, seg_info = \
        _partitioned_voxel_net()
    store = ArtifactStore(str(tmp_path))
    with _pytest.raises(FileNotFoundError):
        load_basic_files(store)

    chosen = {"LMCA": {"initial_voxels": [(10, 21, 13)]},
              "RMCA": {"initial_voxels": [(10, 19, 13)]}}
    save_partition(store, chosen, partition_info, G)
    store.save_segment_list("segmentListCleaned.npz", segments)
    store.save_pickle("segmentInfoDict.pkl", seg_info)
    store.save_pickle("nodeInfoDict.pkl", node_info)

    out = load_basic_files(store)
    assert set(out) == {"G", "segmentList", "segmentInfoDict",
                        "nodeInfoDict", "chosenVoxels", "partitionInfo",
                        "resultADANDict"}
    assert out["resultADANDict"] == {}
    assert len(out["segmentList"]) == len(segments)
    assert out["G"].number_of_nodes() == G.number_of_nodes()
    assert "LMCA" in out["partitionInfo"]


def test_show_volume_per_partition(tmp_path):
    """showVolumePerPartition parity (fluidSimulation.py:3051): the
    per-timestep compartment-volume plot renders from gbm_test5b output;
    CoW names get the Left/Right aggregate series."""
    from arterynetwork_tpu.flow import gbm_test5b
    from arterynetwork_tpu.viz import show_volume_per_partition

    net, _ = _solved_net(seed=4)
    parts = _partitions(net)
    radius_end = net.radius.copy()
    radius_end[:4] *= 0.8
    res = gbm_test5b(net, radius_end, excluded_edges=(), num_timesteps=3,
                     partitions=parts)
    p = str(tmp_path / "vols.png")
    fig = show_volume_per_partition(res, path=p)
    assert os.path.getsize(p) > 1000

    # CoW-style names trigger the Left/Right aggregates
    named = {"LMCA": 1.0, "LPCA": 2.0, "RMCA": 1.5, "RPCA": 2.5}
    res_cow = {"volume_per_partition": [
        {k: v * (1.0 + 0.1 * t) for k, v in named.items()}
        for t in range(3)]}
    fig = show_volume_per_partition(res_cow, path=str(tmp_path / "v2.png"))
    ax = fig.axes[0] if fig.axes else None
    labels = [ln.get_label() for ln in fig.axes[0].get_lines()]
    assert "Left" in labels and "Right" in labels


def test_draw_segments_greedy_coloring(tmp_path):
    from arterynetwork_tpu.viz.network_plot import draw_segments

    # Three branches of a Y sharing voxel (5,5,5): all three must get
    # distinct colors (skeletonization.py:728-733 greedy rule).
    j = (5, 5, 5)
    segs = [
        [(5, 5, 0), (5, 5, 2), j],
        [j, (3, 7, 7), (2, 8, 8)],
        [j, (7, 7, 7), (8, 8, 8)],
    ]
    p = str(tmp_path / "segs.png")
    fig, codes = draw_segments(segs, shape=(10, 10, 10), path=p)
    assert os.path.exists(p)
    assert len(set(codes)) == 3


def test_show_terminating_pressure_and_path_length(tmp_path):
    from arterynetwork_tpu.viz.network_plot import (
        show_terminating_pressure_and_path_length)

    net, gt = _solved_net()
    p = str(tmp_path / "tp_pl.png")
    fig = show_terminating_pressure_and_path_length(
        net, np.asarray(gt.pressure), path=p)
    assert os.path.exists(p)


def test_plot_terminating_pressures_timesteps_all_options(tmp_path):
    from arterynetwork_tpu.constants import PASCAL_PER_MMHG
    from arterynetwork_tpu.viz import plot_terminating_pressures_timesteps

    net, gt = _solved_net(2)
    parts = _partitions(net)
    term = [int(n) for n in net.terminal_nodes()]
    T = 4
    base = np.asarray(gt.pressure)[term] / PASCAL_PER_MMHG
    drift = np.linspace(1.0, 0.95, T)
    tp_array = base[:, None] * drift[None, :]
    for option in (1, 2, 3):
        p = str(tmp_path / f"tp2_opt{option}.png")
        plot_terminating_pressures_timesteps(
            net, term, tp_array, parts, option=option, path=p)
        assert os.path.getsize(p) > 1000


def test_pressure_velocity_arrays_interpolation_and_orientation():
    from arterynetwork_tpu.graphs.network import FlowNetwork
    from arterynetwork_tpu.viz import pressure_velocity_arrays

    # Two chains; segment 1's chain is stored tail-first to exercise the
    # orientation fix (the reference reads per-voxel node dicts instead,
    # partitionCompartmentGUIDetail.py:602-627).
    coords = np.array([[0, 0, 0], [0, 0, 4], [0, 4, 4]], np.int32)
    net = FlowNetwork(
        heads=np.array([0, 1], np.int32), tails=np.array([1, 2], np.int32),
        node_depth=np.array([0, 1, 2], np.int32),
        radius=np.ones(2), length=np.array([4.0, 4.0]),
        c=np.ones(2), k=np.full(2, 1.852),
        entry_nodes=np.array([0], np.int32),
        node_coord=coords,
        edge_segment_index=np.array([0, 1], np.int32))
    segments = [
        [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 3), (0, 0, 4)],
        [(0, 4, 4), (0, 3, 4), (0, 2, 4), (0, 1, 4), (0, 0, 4)],  # reversed
    ]
    pressure = np.array([100.0, 80.0, 60.0])
    velocity = np.array([0.5, -0.25])
    parr, varr = pressure_velocity_arrays(segments, [0, 1], net,
                                          pressure, velocity)
    assert parr.shape == (10, 4) and varr.shape == (10, 4)
    # chain 0: head (0,0,0)=100 -> tail (0,0,4)=80, linear
    np.testing.assert_allclose(parr[:5, 3], np.linspace(100, 80, 5))
    # chain 1 stored tail-first: starts at node 2 (60) and ends at node 1 (80)
    np.testing.assert_allclose(parr[5:, 3], np.linspace(60, 80, 5))
    # velocity constant per segment, magnitude
    np.testing.assert_allclose(varr[:5, 3], 0.5)
    np.testing.assert_allclose(varr[5:, 3], 0.25)
    # coordinates pass through
    np.testing.assert_array_equal(parr[0, :3], [0, 0, 0])
    np.testing.assert_array_equal(parr[5, :3], [0, 4, 4])


def test_pressure_velocity_volumes_scatter_and_accumulate():
    from arterynetwork_tpu.viz import pressure_velocity_volumes
    from arterynetwork_tpu.viz.network_plot import pressure_velocity_volumes as _same

    parr = np.array([[0, 0, 0, 10.0], [1, 2, 3, 20.0]])
    varr = np.array([[0, 0, 0, 0.5], [1, 2, 3, 0.25]])
    pv, vv = pressure_velocity_volumes((4, 4, 4), parr, varr)
    assert pv[0, 0, 0] == 10.0 and pv[1, 2, 3] == 20.0
    assert vv[0, 0, 0] == 0.5 and vv[1, 2, 3] == 0.25
    assert pv.sum() == 30.0
    # accumulate a second partition; overlapping voxel overwritten
    pv2, vv2 = pressure_velocity_volumes(
        (4, 4, 4), np.array([[0, 0, 0, 99.0]]), np.zeros((0, 4)),
        out=(pv, vv))
    assert pv2[0, 0, 0] == 99.0 and pv2[1, 2, 3] == 20.0


def test_plot_radius_vs_graph_level(tmp_path):
    from arterynetwork_tpu.viz import plot_radius_vs_graph_level

    net, _ = _solved_net(4)
    parts = _partitions(net)
    p = str(tmp_path / "bfstest.png")
    plot_radius_vs_graph_level(net, parts, path=p)
    assert os.path.getsize(p) > 1000
