"""Longitudinal engine + boundary/perturbation tests.

The synthetic stand-in for the GBM network: a merge-enabled tree whose
compartments are defined by its depth-1 children (the reference hard-codes
CoW node ids for the same purpose, fluidSimulation.py:822-823).
"""

import numpy as np

from arterynetwork_tpu.flow import build_system, create_ground_truth
from arterynetwork_tpu.flow.adan import ADANModel, set_network_ck
from arterynetwork_tpu.flow.boundary import (
    bfs_partition,
    fit_terminating_pressure_to_path_length,
    set_terminating_pressure,
    terminating_nodes_of_partition,
    volume_per_partition,
)
from arterynetwork_tpu.flow.longitudinal import run_longitudinal
from arterynetwork_tpu.flow.perturb import (
    interpolate_radii,
    perturb_radius_per_partition,
    perturb_radius_random,
    perturb_terminating_pressure,
)
from arterynetwork_tpu.flow.residual import validate_equations, pack_velocity_pressure
from arterynetwork_tpu.graphs import generate_tree, set_network_properties


def _net(seed=0, depth=6):
    rng = np.random.default_rng(seed)
    net = generate_tree(max_depth=depth, rng=rng)
    net = set_network_properties(net, k_value=1.852, rng=rng)
    return set_network_ck(net)


def _partitions(net):
    """One compartment per depth-1 node."""
    roots = np.nonzero(net.node_depth == 1)[0]
    return {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
            for i, r in enumerate(roots)}


def test_bfs_partition_covers_subtree():
    net = _net()
    parts = _partitions(net)
    all_visited = set()
    for part in parts.values():
        res = bfs_partition(net, part["start_nodes"], part["boundary_nodes"])
        all_visited |= set(res["visited_nodes"])
    # all nodes except the root are covered by some compartment
    assert all_visited == set(range(1, net.num_nodes))


def test_volume_per_partition_positive():
    net = _net()
    vols = volume_per_partition(net, _partitions(net))
    assert all(v > 0 for v in vols.values())


def test_terminating_pressure_model_and_inverse_fit():
    net = _net()
    parts = _partitions(net)
    slope = -8000.0
    bp = set_terminating_pressure(net, parts, slope=slope,
                                  pressure_in=15000.0)
    term = net.terminal_nodes()
    assert np.isfinite(bp[term]).all()
    # inverse fit recovers the slope scaled by the 0.8 factor
    fits = fit_terminating_pressure_to_path_length(net, bp, parts)
    for name, (s, _i) in fits.items():
        if np.isfinite(s) and s != 0.0:
            assert abs(s - slope * 0.8) / abs(slope * 0.8) < 1e-6


def test_perturb_radius_operators():
    net = _net()
    p1 = perturb_radius_random(net, num_edges=5, reduce_percentage=30,
                               rng=np.random.default_rng(1))
    assert (p1.radius <= net.radius + 1e-12).all()
    assert (p1.radius < net.radius).sum() >= 1

    parts = _partitions(net)
    name = list(parts)[0]
    p3 = perturb_radius_per_partition(net, [name], 25.0, parts)
    res = bfs_partition(net, parts[name]["start_nodes"], [])
    inside = np.asarray(res["visited_edges"])
    outside = np.setdiff1d(np.arange(net.num_edges), inside)
    np.testing.assert_allclose(p3.radius[inside], net.radius[inside] * 0.75)
    np.testing.assert_allclose(p3.radius[outside], net.radius[outside])


def test_perturb_terminating_pressure_drop_scaling():
    net = _net()
    parts = _partitions(net)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(0))
    assert gt.success
    root_p = gt.pressure[0]
    change = {name: 0.5 for name in parts}
    newp = perturb_terminating_pressure(
        net, gt.pressure, pressure_drop_change_per_partition=change,
        partitions=parts, root_pressure=root_p)
    for name, part in parts.items():
        for n in terminating_nodes_of_partition(net, part):
            drop_old = root_p - gt.pressure[n]
            drop_new = root_p - newp[n]
            np.testing.assert_allclose(drop_new, drop_old * 1.5, rtol=1e-12)


def test_interpolate_radii_endpoints():
    r0 = np.array([1.0, 2.0, 3.0])
    r1 = np.array([0.5, 2.0, 4.0])
    lin = interpolate_radii(r0, r1, 5, option=1)
    np.testing.assert_allclose(lin[0], r0)
    np.testing.assert_allclose(lin[-1], r1)
    np.testing.assert_allclose(lin[2], (r0 + r1) / 2)
    tanh = interpolate_radii(r0, r1, 5, option=2)
    np.testing.assert_allclose(tanh[0], r0)
    np.testing.assert_allclose(tanh[-1], r1)


def test_run_longitudinal_batched():
    """Full GBMTest5 protocol on a synthetic tree: every timestep solves
    to physical validity; timestep 0 reproduces the ground truth."""
    net = _net(seed=3, depth=5)
    parts = _partitions(net)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(2))
    assert gt.success

    # "2013" radii: every compartment shrinks by 20% (tumor progression)
    radius_end = net.radius * 0.8

    batch, sol = run_longitudinal(
        net, gt.pressure, radius_end, num_timesteps=4,
        interpolation_option=1, partitions=parts)

    pressures = np.asarray(sol.pressure)      # [T, N]
    flows = np.asarray(sol.flow)              # [T, E]
    assert pressures.shape[0] == 4
    assert np.isfinite(pressures).all() and np.isfinite(flows).all()
    assert np.asarray(sol.residual_norm).max() < 1e-10

    # timestep 0 has unperturbed radii and pressures -> ground truth
    np.testing.assert_allclose(pressures[0], gt.pressure, rtol=1e-7,
                               atol=1e-6)
    np.testing.assert_allclose(flows[0], gt.flow, rtol=1e-6, atol=1e-15)

    # later timesteps: narrower vessels, same pressure drops scaled up
    # by the volume-change rule -> flows decrease
    assert flows[-1].sum() < flows[0].sum()


def test_calculate_variable_bounds():
    """argsBoundTest parity (fluidSimulation.py:2711-2756): parent bounds
    are the max over child (bounds or fixed pressures), monotone up the
    tree."""
    from arterynetwork_tpu.flow.boundary import calculate_variable_bounds

    net = _net(seed=1, depth=5)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    assert gt.success
    bounds = calculate_variable_bounds(net, gt.pressure)
    deg = net.degree
    depth = net.node_depth
    interior = np.nonzero((deg != 1) & (depth > 0)
                          & (depth < depth.max()))[0]
    assert np.isfinite(bounds[interior]).all()
    # true interior pressures respect their lower bounds
    assert (gt.pressure[interior] >= bounds[interior] - 1e-9).all()
