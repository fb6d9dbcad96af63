"""Solver round-trip tests.

Mirrors the reference's de-facto integration test: generate a network,
construct an exact solution with the depth-sweep ground-truth generator,
hand the solver only the boundary pressures, and require the recovered
pressures/flows to match (computeNetworkTest / GBMTest3 semantics,
fluidSimulation.py:2533-2709, SURVEY.md §4.2).
"""

import numpy as np
import pytest

from arterynetwork_tpu.constants import INLET_PRESSURE
from arterynetwork_tpu.flow import (
    build_system,
    create_ground_truth,
    pack_velocity_pressure,
    residual_reference,
    solve_poiseuille,
    solve_pressure_newton,
    validate_equations,
)
from arterynetwork_tpu.graphs import generate_tree, set_network_properties


def _tree(max_depth=7, k=1.852, seed=0, allow_merge=False):
    rng = np.random.default_rng(seed)
    net = generate_tree(max_depth=max_depth, allow_merge=allow_merge, rng=rng)
    net = set_network_properties(net, k_value=k, rng=rng)
    return net


def _boundary_from_ground_truth(net, gt):
    """Boundary pressure vector: ground-truth values at fixed nodes."""
    return gt.pressure


@pytest.mark.parametrize("k", [1.0, 1.852])
@pytest.mark.parametrize("option", [1, 2])
def test_tree_round_trip(k, option):
    net = _tree(max_depth=7, k=k, seed=42)
    gt = create_ground_truth(net, option=option,
                             rng=np.random.default_rng(7))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_pressure_newton(system)

    # Pressures match to ~1e-9 relative (far below the 1e-6 parity target).
    np.testing.assert_allclose(np.asarray(sol.pressure), gt.pressure,
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.flow), gt.flow,
                               rtol=1e-7, atol=1e-14)
    np.testing.assert_allclose(np.asarray(sol.velocity), gt.velocity,
                               rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("allow_merge", [False, True])
def test_f32_refined_pressure_parity(allow_merge):
    """Compensated (double-single) refinement closes f32 pressure parity
    to <=1e-6 relative — the BASELINE.md north-star target the TPU must
    meet without f64.  Default refine_steps already applies for f32."""
    import jax.numpy as jnp

    from arterynetwork_tpu.flow.tree_solver import plan_elimination

    seed = 6 if allow_merge else 42
    net = _tree(max_depth=10, k=1.852, seed=seed, allow_merge=allow_merge)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(7))
    if not gt.success:      # some merge draws are infeasible by design
        pytest.skip("infeasible merge draw")
    system = build_system(net, boundary_pressure=gt.pressure,
                          dtype=jnp.float32)
    plan = None if allow_merge else plan_elimination(system)
    solver = "auto" if plan is not None else "dense"
    sol = solve_pressure_newton(system, max_iter=60, tol=1e-9,
                                linear_solver=solver, plan=plan)
    err = np.nanmax(np.abs(np.asarray(sol.pressure, np.float64)
                           - gt.pressure) / np.abs(gt.pressure))
    assert err <= 1e-6, err
    # without refinement the same solve floors at ~5e-6 (regression guard
    # that the refinement path is actually on by default)
    sol0 = solve_pressure_newton(system, max_iter=60, tol=1e-9,
                                 linear_solver=solver, plan=plan,
                                 refine_steps=0)
    err0 = np.nanmax(np.abs(np.asarray(sol0.pressure, np.float64)
                            - gt.pressure) / np.abs(gt.pressure))
    assert err < err0


def test_multi_start_restarts():
    """The basinhopping-slot escape: a healthy solve is unchanged by
    restarts (the trigger never fires); a starved solve keeps the best
    basin across restarts (residual monotonically <= single-start)."""
    import jax.numpy as jnp

    net = _tree(max_depth=8, k=1.852, seed=21)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(3))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure,
                          dtype=jnp.float32)
    base = solve_pressure_newton(system, max_iter=60, tol=1e-9)
    with_r = solve_pressure_newton(system, max_iter=60, tol=1e-9,
                                   restarts=2)
    np.testing.assert_array_equal(np.asarray(base.pressure),
                                  np.asarray(with_r.pressure))

    starved0 = solve_pressure_newton(system, max_iter=2, tol=1e-9,
                                     refine_steps=0)
    starved3 = solve_pressure_newton(system, max_iter=2, tol=1e-9,
                                     refine_steps=0, restarts=3)
    assert float(starved3.residual_norm) <= float(starved0.residual_norm)


def test_poiseuille_linear_solve_exact():
    """k=1 networks solve in a single Newton step (graph Laplacian solve)."""
    net = _tree(max_depth=7, k=1.0, seed=3)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_poiseuille(system)
    np.testing.assert_allclose(np.asarray(sol.pressure), gt.pressure,
                               rtol=1e-8, atol=1e-8)


def test_reference_residual_zero_at_ground_truth():
    net = _tree(max_depth=6, k=1.852, seed=5)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(2))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    r = np.asarray(residual_reference(gt.velocity_pressure, system))
    # Residuals are magnified by 2e10 (flow) / 0.0377*500 (pressure); the
    # ground truth should still zero them out.
    assert np.abs(r).max() < 1e-3


def test_validate_equations_at_solution():
    net = _tree(max_depth=6, k=1.852, seed=11)
    gt = create_ground_truth(net, option=1, rng=np.random.default_rng(4))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_pressure_newton(system)
    x = pack_velocity_pressure(system, np.asarray(sol.pressure),
                               np.abs(np.asarray(sol.velocity)))
    report = validate_equations(x, system)
    # Solver tolerance is 1e-14 m^3/s nodal imbalance = 1e-8 cm^3/s; the
    # reference accepted errors ~1e-3 in these units.
    assert report["pressure_summary"]["max"] < 1e-8   # mmHg
    assert report["flow_summary"]["max"] < 2e-8       # cm^3/s
    assert report["n_pressure_inversions"] == 0


def test_merge_network_round_trip():
    """Networks with CoW-like merge loops still solve exactly."""
    success = False
    for seed in range(20):
        net = _tree(max_depth=6, k=1.852, seed=seed, allow_merge=True)
        if net.num_nodes == net.num_edges + 1:
            continue  # no merge happened; want a loopy one
        gt = create_ground_truth(net, option=2,
                                 rng=np.random.default_rng(seed))
        if not gt.success:
            continue
        success = True
        system = build_system(net, boundary_pressure=gt.pressure)
        sol = solve_pressure_newton(system)
        np.testing.assert_allclose(np.asarray(sol.pressure), gt.pressure,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.flow), gt.flow,
                                   rtol=1e-7, atol=1e-16)
        break
    assert success, "no solvable merge network found in 20 seeds"


def test_cg_backend_matches_dense():
    net = _tree(max_depth=8, k=1.852, seed=9)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(3))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    dense = solve_pressure_newton(system, linear_solver="dense")
    cg = solve_pressure_newton(system, linear_solver="cg")
    np.testing.assert_allclose(np.asarray(cg.pressure),
                               np.asarray(dense.pressure),
                               rtol=0, atol=1e-5)


def test_ground_truth_inlet_conditions():
    net = _tree(max_depth=5, k=1.852, seed=1)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(0))
    assert gt.success
    assert gt.pressure[0] == INLET_PRESSURE
    # Flow conservation: inlet flow equals the sum of terminal flows.
    term = net.terminal_nodes()
    term_edges = [e for e in range(net.num_edges)
                  if net.tails[e] in set(term.tolist())]
    np.testing.assert_allclose(gt.flow[term_edges].sum(),
                               754.0 / 60 / 1e6, rtol=1e-12)


def test_tree_elimination_solver_matches_dense():
    """Direct tree elimination equals the dense solve on trees and on
    merge (loopy) networks."""
    from arterynetwork_tpu.flow.tree_solver import plan_elimination

    for seed, merge in ((0, False), (3, True), (7, True)):
        net = _tree(max_depth=7, k=1.852, seed=seed, allow_merge=merge)
        gt = create_ground_truth(net, option=2,
                                 rng=np.random.default_rng(seed))
        if not gt.success:
            continue
        system = build_system(net, boundary_pressure=gt.pressure)
        plan = plan_elimination(system)
        dense = solve_pressure_newton(system, linear_solver="dense")
        tree = solve_pressure_newton(system, linear_solver="tree",
                                     plan=plan)
        np.testing.assert_allclose(np.asarray(tree.pressure),
                                   np.asarray(dense.pressure),
                                   rtol=1e-9, atol=1e-7)
        np.testing.assert_allclose(np.asarray(tree.pressure), gt.pressure,
                                   rtol=1e-8, atol=1e-7)


def test_tree_plan_core_is_small():
    """On a merge network the 2-core is only the loop nodes."""
    from arterynetwork_tpu.flow.tree_solver import plan_elimination

    net = _tree(max_depth=7, k=1.852, seed=3, allow_merge=True)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(3))
    if not gt.success:
        return
    system = build_system(net, boundary_pressure=gt.pressure)
    plan = plan_elimination(system)
    n_loops = net.num_edges - (net.num_nodes - 1)
    # core nodes ~ a few per loop; zero when no merges happened
    assert plan.core_size <= max(4 * n_loops, 0) + 2


def test_darcy_weisbach_ck_matches_reference_formula():
    """``darcy_weisbach_ck`` reproduces the law the reference's empty
    ``method='DW'`` branch documents (fluidSimulation.py:4640-4645,
    4692-4693): laminar f = 64/Re = 64*nu/(v*D), so
    dP = f * (L/D) * (rho v^2 / 2)."""
    from arterynetwork_tpu.constants import (BLOOD_KINEMATIC_VISCOSITY,
                                             RHO_BLOOD)
    from arterynetwork_tpu.flow import darcy_weisbach_ck, dp_from_flow

    r = np.array([0.5e-3, 1.0e-3, 2.5e-3])        # m
    length = np.array([0.01, 0.025, 0.07])        # m
    v = np.array([0.08, 0.5, 1.2])                # m/s
    c, k = darcy_weisbach_ck(r)
    np.testing.assert_allclose(np.asarray(k), 1.0)

    q = v * np.pi * r ** 2
    dp = np.asarray(dp_from_flow(q, r, length, np.asarray(c), np.asarray(k)))

    d = 2.0 * r
    f = 64.0 * BLOOD_KINEMATIC_VISCOSITY / (v * d)           # 64/Re
    expected = f * (length / d) * (RHO_BLOOD * v ** 2 / 2.0)  # D-W head loss
    np.testing.assert_allclose(dp, expected, rtol=1e-12)


def test_darcy_weisbach_network_round_trip():
    """A DW network solves through the unchanged stack and every edge
    obeys Hagen-Poiseuille (the laminar D-W law) at the solution."""
    from arterynetwork_tpu.constants import (BLOOD_KINEMATIC_VISCOSITY,
                                             RHO_BLOOD)
    from arterynetwork_tpu.flow import apply_darcy_weisbach

    net = _tree(max_depth=7, seed=11)
    net = apply_darcy_weisbach(net)
    assert np.all(np.asarray(net.k) == 1.0)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(11))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure)
    sol = solve_pressure_newton(system)
    np.testing.assert_allclose(np.asarray(sol.pressure), gt.pressure,
                               rtol=1e-8, atol=1e-8)

    p = np.asarray(sol.pressure)
    q = np.abs(np.asarray(sol.flow))
    head = np.asarray(system.head)
    tail = np.asarray(system.tail)
    dp_node = p[head] - p[tail]
    mu = RHO_BLOOD * BLOOD_KINEMATIC_VISCOSITY
    d = 2.0 * np.asarray(net.radius_m())
    poiseuille = 128.0 * mu * np.asarray(net.length_m()) * q / (np.pi * d ** 4)
    np.testing.assert_allclose(dp_node, poiseuille, rtol=1e-6, atol=1e-8)


def test_apply_velocity_pressure_round_trip():
    """pack -> apply returns the exact solved state on the network
    (getVelocityPressure :785 / updateNetworkWithSimulationResult :1519)."""
    from arterynetwork_tpu.flow import apply_velocity_pressure

    net = _tree(max_depth=5, seed=3)
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(3))
    system = build_system(net, boundary_pressure=gt.pressure)
    x = pack_velocity_pressure(system, gt.pressure, gt.velocity)
    out = apply_velocity_pressure(net, system, x)
    np.testing.assert_allclose(out.node_pressure, gt.pressure,
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(out.edge_velocity, gt.velocity, rtol=1e-12)
    np.testing.assert_allclose(out.edge_flow, gt.flow, rtol=1e-12)
