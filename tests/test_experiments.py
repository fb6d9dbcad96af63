"""Experiment driver tests (GBMTest* equivalents)."""

import numpy as np

from arterynetwork_tpu.flow.adan import set_network_ck
from arterynetwork_tpu.flow.experiments import (
    apply_flow_to_network,
    compute_network_test,
    pressure_perturbation_study,
    radius_perturbation_study,
    solver_sanity_test,
    update_edge_radius,
)
from arterynetwork_tpu.flow.ground_truth import create_ground_truth
from arterynetwork_tpu.graphs import generate_tree, set_network_properties


def _net(seed=0, depth=6):
    rng = np.random.default_rng(seed)
    net = generate_tree(max_depth=depth, rng=rng)
    net = set_network_properties(net, k_value=1.852, rng=rng)
    return set_network_ck(net)


def test_solver_sanity():
    out = solver_sanity_test(_net())
    assert out["success"]
    assert out["max_pressure_error_pa"] < 1e-6
    assert out["validation"]["n_pressure_inversions"] == 0


def test_compute_network_test_converges():
    out = compute_network_test(_net(seed=1), tp_scale=0.05,
                               rng=np.random.default_rng(3))
    assert out["success"]
    # the signed solve conserves flow exactly ...
    assert out["residual_norm"] < 1e-12
    # ... while the reference's |v| head->tail formulation reports any
    # flow reversals induced by the perturbation as inversions (the same
    # head<=tail counter the reference prints, fluidSimulation.py:1193);
    # non-reversed equations are tight.
    if out["validation"]["n_pressure_inversions"] == 0:
        assert out["validation"]["flow_summary"]["max"] < 1e-6
    # the solution differs from the unperturbed ground truth
    assert not np.allclose(out["solution"], out["ground_truth"])


def test_radius_perturbation_redistributes_flow():
    out = radius_perturbation_study(_net(seed=2), num_edges=8,
                                    reduce_percentage=40,
                                    rng=np.random.default_rng(1))
    assert out["success"]
    assert np.abs(out["flow_change"]).max() > 0
    assert out["validation"]["pressure_summary"]["max"] < 1e-6


def test_pressure_perturbation_study():
    net = _net(seed=3, depth=5)
    roots = np.nonzero(net.node_depth == 1)[0]
    parts = {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
             for i, r in enumerate(roots)}
    dec = {name: 0.1 for name in parts}
    out = pressure_perturbation_study(net, dec, parts)
    assert out["success"]
    # lower terminating pressures -> more flow out
    assert out["perturbed_flow"].sum() > out["baseline_flow"].sum()


def test_update_edge_radius_rederives_ck():
    net = _net()
    new_r = net.radius * 0.5
    net2 = update_edge_radius(net, new_r)
    np.testing.assert_allclose(net2.radius, new_r)
    assert net2.c.shape == net.c.shape


def test_apply_flow_forward_sweep_matches_ground_truth():
    net = _net(seed=4, depth=5)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(0))
    assert gt.success
    out = apply_flow_to_network(net, gt.flow, inlet_pressure=gt.pressure[0])
    np.testing.assert_allclose(out.node_pressure, gt.pressure, rtol=1e-10)
    np.testing.assert_allclose(out.edge_velocity, gt.velocity, rtol=1e-10)


def test_compare_network_properties():
    from arterynetwork_tpu.flow.experiments import compare_network_properties

    net = _net(seed=5, depth=5)
    net2 = net.replace(radius=net.radius * 0.7)
    out = compare_network_properties(net, net2)
    assert abs(out["radius_ratio_mean"] - 0.7) < 1e-12
    assert all(abs(v["mean"] - 0.7) < 1e-12
               for v in out["radius_ratio_per_depth"].values())


def test_examine_fluid_result():
    from arterynetwork_tpu.flow.experiments import examine_fluid_result
    from arterynetwork_tpu.flow import build_system
    from arterynetwork_tpu.flow.solvers import solve_pressure_newton

    net = _net(seed=6, depth=5)
    roots = np.nonzero(net.node_depth == 1)[0]
    parts = {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
             for i, r in enumerate(roots)}
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(0))
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_pressure_newton(system)
    out = examine_fluid_result(net, sol, parts)
    total_in = sum(p["inlet_flow_cm3s"]
                   for p in out["per_partition"].values())
    np.testing.assert_allclose(total_in, out["total_terminal_flow_cm3s"],
                               rtol=1e-6)


def test_show_flow_info_and_tp_print(capsys):
    from arterynetwork_tpu.flow import build_system
    from arterynetwork_tpu.flow.experiments import (
        print_terminating_pressure_per_partition, show_flow_info)
    from arterynetwork_tpu.flow.solvers import solve_pressure_newton

    net = _net(seed=7, depth=5)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_pressure_newton(system)

    text = show_flow_info(net, sol, num=4)
    assert "Edge 0:" in text and "Node 3:" in text
    q0 = float(np.asarray(sol.flow)[0]) * 1e6
    assert "flow={:.3f} cm^3/s".format(q0) in text

    roots = np.nonzero(net.node_depth == 1)[0]
    parts = {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
             for i, r in enumerate(roots)}
    out = print_terminating_pressure_per_partition(
        net, np.asarray(sol.pressure), parts)
    captured = capsys.readouterr().out
    assert set(out) == set(parts)
    for name, tps in out.items():
        assert tps == sorted(tps)
        assert "Terminating pressures in {}".format(name) in captured


def test_load_fluid_result_round_trip(tmp_path):
    from arterynetwork_tpu.flow.experiments import load_fluid_result
    from arterynetwork_tpu.io import ArtifactStore

    store = ArtifactStore(str(tmp_path))
    x = np.arange(7, dtype=float)
    store.save_pickle("res.pkl", {"velocityPressure": x, "flow": x[:3]})
    got, result = load_fluid_result(store, "res.pkl")
    np.testing.assert_allclose(got, x)
    assert "flow" in result

    # Legacy reference layout: rebuild from per-item argsIndex
    # (fluidSimulation.py:1563-1580).
    node_info = {0: {}, 1: {"argsIndex": 2,
                            "simulationData": {"pressure": 9.0}}}
    edge_info = {0: {"argsIndex": 0, "simulationData": {"velocity": 0.4}},
                 1: {"argsIndex": 1, "simulationData": {"velocity": 0.7}}}
    store.save_pickle("legacy.pkl", {"perturbedYear": {
        "nodeInfoDict": node_info, "edgeInfoDict": edge_info}})
    got2, _ = load_fluid_result(store, "legacy.pkl")
    np.testing.assert_allclose(got2, [0.4, 0.7, 9.0])
