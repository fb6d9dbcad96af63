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
