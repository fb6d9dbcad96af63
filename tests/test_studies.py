"""Longitudinal flow-split / TP studies: test1-test6 + GBMTest4 drivers
(fluidSimulation.py:3133-3837, 2058-2148) and the GBMTest5 per-timestep
save contract (:2283-2291)."""

import numpy as np
import pytest

from arterynetwork_tpu.flow import (
    create_ground_truth,
    flow_proportions_per_partition,
    flow_split_study,
    gbm_test4,
    same_flow_study,
    save_gbm_test5_results,
    tp_fit_solve_study,
    two_timepoint_comparison,
)
from arterynetwork_tpu.graphs import generate_tree, set_network_properties
from arterynetwork_tpu.io.artifacts import ArtifactStore


@pytest.fixture(scope="module")
def net():
    rng = np.random.default_rng(0)
    n = generate_tree(max_depth=6, rng=rng)
    return set_network_properties(n, k_value=1.852, rng=rng)


PARTS = {"LMCA": {"start_nodes": [1], "boundary_nodes": []},
         "RMCA": {"start_nodes": [2], "boundary_nodes": []}}


def _radius_end(net, shrink=0.85):
    # tumor-side shrinkage: all edges below node 1 lose 15%
    from arterynetwork_tpu.flow.boundary import bfs_partition
    r = net.radius.copy()
    res = bfs_partition(net, [1], [])
    r[res["visited_edges"]] *= shrink
    return r


def test_flow_split_study_structure(net):
    out = flow_split_study(net, _radius_end(net), num_timesteps=4,
                           partitions=PARTS)
    T = 4
    term = out["terminating_nodes"]
    assert len(term) > 10
    assert out["terminating_pressures_mmhg"].shape == (len(term), T)
    assert out["node_pressures_mmhg"].shape == (net.num_nodes, T)
    assert out["flow"].shape == (net.num_edges, T)
    assert out["failed_timesteps"] == []
    # endpoints anchored: timestep 0 radii = baseline, last = radius_end
    np.testing.assert_allclose(out["radii"][0], net.radius)
    np.testing.assert_allclose(out["radii"][-1], _radius_end(net))
    # physics: terminating pressures finite, below inlet (120 mmHg)
    tp = out["terminating_pressures_mmhg"]
    assert np.isfinite(tp).all()
    assert (tp < 120.0).all() and (tp > 0.0).all()


def test_flow_split_tanh_interpolation(net):
    out = flow_split_study(net, _radius_end(net), num_timesteps=5,
                           interpolation_option=2, partitions=PARTS)
    # tanh curve: interior radii between endpoints, monotone toward end
    r = out["radii"]
    mid = r[2]
    lo = np.minimum(r[0], r[-1]) - 1e-12
    hi = np.maximum(r[0], r[-1]) + 1e-12
    assert ((mid >= lo) & (mid <= hi)).all()


def test_same_flow_study(net):
    out = same_flow_study(net, _radius_end(net), num_timesteps=3,
                          partitions=PARTS)
    assert out["success"]
    tp = out["terminating_pressures_mmhg"]
    assert np.isfinite(tp).all()
    # same flow through narrower vessels -> larger pressure drop ->
    # terminating pressures decrease over time on the shrunk side
    from arterynetwork_tpu.flow.boundary import bfs_partition
    shrunk_nodes = set(bfs_partition(net, [1], [])["visited_nodes"])
    term = out["terminating_nodes"]
    rows = [i for i, n in enumerate(term) if int(n) in shrunk_nodes]
    assert rows
    assert (tp[rows, -1] < tp[rows, 0] - 1e-9).all()
    # flows identical at every timestep by construction
    assert np.allclose(out["flow"][:, 0], out["flow"][:, -1])


def test_two_timepoint_comparison(net):
    out = two_timepoint_comparison(net, _radius_end(net))
    assert out["success"]
    assert out["radius_mm_before"].shape == (net.num_edges,)
    ratio = out["radius_mm_after"] / out["radius_mm_before"]
    assert ((np.isclose(ratio, 1.0)) | (np.isclose(ratio, 0.85))).all()
    assert np.isfinite(out["pressure_after"]).all()


def test_tp_fit_solve_study_and_pickles(net, tmp_path):
    store = ArtifactStore(str(tmp_path))
    out = tp_fit_solve_study(net, _radius_end(net), num_timesteps=3,
                             partitions=PARTS, store=store, version=5)
    assert out["success"]
    assert set(out["fit_per_partition"]) == {"LMCA", "RMCA"}
    for t in range(3):
        assert store.exists(
            "fluidSimulationResultTest6_Timestep={}_v5.pkl".format(t))
    # validation thresholds: the Newton solve satisfies its residual and
    # the reference-protocol pressure audit.  (The reference's flow audit
    # packs |v|, so edges that physically reverse under fit-based
    # terminal pressures appear as conservation error there — the signed
    # residual_norm is the actual convergence measure.)
    for row in out["timesteps"]:
        rep = row["validation"]
        assert row["residual_norm"] < 1e-8
        assert rep["pressure_summary"]["max"] < 1e-3  # mmHg
        assert "n_pressure_inversions" in rep
    blob = store.load_pickle("fluidSimulationResultTest6_Timestep=0_v5.pkl")
    assert "velocityPressure" in blob and "fitResultPerPartition" in blob


def test_tp_fit_slope_scale_lowers_tp(net):
    base = tp_fit_solve_study(net, _radius_end(net), num_timesteps=2,
                              partitions=PARTS)
    scaled = tp_fit_solve_study(net, _radius_end(net), num_timesteps=2,
                                slope_scale=0.7, partitions=PARTS)
    # v2-style run (slope reduced 30%): shallower decay -> *higher*
    # terminating pressures at distance
    assert (scaled["terminating_pressures_mmhg"].mean()
            > base["terminating_pressures_mmhg"].mean())


def test_gbm_test4(net, tmp_path):
    store = ArtifactStore(str(tmp_path))
    out = gbm_test4(net, partitions=PARTS, partition_to_perturb=("LMCA",),
                    reduce_percentage=10.0, store=store)
    assert out["success"]
    # LMCA subtree radii reduced by 10%
    from arterynetwork_tpu.flow.boundary import bfs_partition
    edges = bfs_partition(net, [1], [])["visited_edges"]
    np.testing.assert_allclose(out["perturbed_radius"][edges],
                               net.radius[edges] * 0.9)
    rep = out["validation"]
    assert rep["pressure_summary"]["max"] < 1e-3
    assert store.exists("fluidSimulationResultGBMTest4(solvedYear=BraVa, "
                        "perturbNetworkOption=1).pkl")


def test_gbm_test5b_volume_diagnostic(net):
    from arterynetwork_tpu.flow import gbm_test5b

    T = 4
    excluded = (0, 1)
    out = gbm_test5b(net, _radius_end(net), num_timesteps=T,
                     excluded_edges=excluded, partitions=PARTS)
    assert out["success"]
    assert out["radii"].shape == (T, net.num_edges)
    # excluded inlet edges keep the baseline radius at every timestep
    for e in excluded:
        np.testing.assert_allclose(out["radii"][:, e], net.radius[e])
    assert len(out["volume_per_partition"]) == T
    # timestep 0 == baseline -> zero adjustment everywhere
    for v in out["pressure_drop_change_per_partition"][0].values():
        assert v == pytest.approx(0.0)
    # LMCA subtree shrank 15% in radius -> volume drops -> the
    # pressure-drop adjustment is positive and grows monotonically
    lmca = [d["LMCA"] for d in out["pressure_drop_change_per_partition"]]
    assert lmca[-1] > 0.1
    assert all(b >= a - 1e-12 for a, b in zip(lmca, lmca[1:]))
    # hand-check the last timestep against Sum(pi r^2 L)
    v0 = out["volume_per_partition_baseline"]["LMCA"]
    vT = out["volume_per_partition"][-1]["LMCA"]
    assert lmca[-1] == pytest.approx(-(vT - v0) / v0)


def test_gbm_test5_save_contract(net, tmp_path):
    import jax.numpy as jnp

    from arterynetwork_tpu.flow.longitudinal import run_longitudinal

    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    assert gt.success
    batch, sol = run_longitudinal(net, gt.pressure, _radius_end(net),
                                  num_timesteps=3, partitions=PARTS,
                                  dtype=jnp.float64)
    store = ArtifactStore(str(tmp_path))
    names = save_gbm_test5_results(store, net, batch, sol)
    assert names == [
        "fluidSimulationResult_GBMTest5_Timestep={}_v1.pkl".format(t)
        for t in range(3)]
    blob = store.load_pickle(names[1])
    assert {"velocityPressure", "pressure", "flow",
            "boundaryPressure"} <= set(blob)
    assert np.isfinite(blob["pressure"]).all()


def test_flow_proportions(net):
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    props = flow_proportions_per_partition(
        net, gt.flow[:, None], partitions=PARTS)
    total = sum(v[0] for v in props.values())
    assert np.isclose(total, 1.0)


# ---------------------------------------------------------------------------
# Reference-protocol cross-checks (round-3): the Newton study solves must
# agree with an INDEPENDENT solve of the same system under the
# reference's own evaluation model (equation-dict objective + scipy
# least_squares, utils/reference_protocol.py) to ~1e-3 relative — the
# reference's own acceptance (fluidSimulation.py:2684 comparison).
# ---------------------------------------------------------------------------


def _cross_check(net_t, bp, ours_pressure, ours_velocity):
    """Our Newton solution must be a fixed point of the reference
    protocol: near-zero reference-objective cost (orders of magnitude
    below the objective at the reference's own init) and no drift when
    the reference's optimizer is started at it.  (A cold-started
    least_squares stalls at cost ~1e7 from the reference init on these
    configs — the very reason the reference needs basinhopping — so
    agreement is asserted at the solution, not between two solver
    runs.)"""
    from arterynetwork_tpu.utils.reference_protocol import (
        cross_check_solution)

    chk = cross_check_solution(net_t, bp, ours_pressure, ours_velocity)
    assert chk["cost_at_solution"] < 1e-6 * chk["cost_at_reference_init"], chk
    assert chk["warm_pressure_drift_rel"] < 1e-3, chk


def test_tp_fit_study_matches_reference_protocol():
    """One timestep of tp_fit_solve_study scored under the reference
    protocol (equation-dict objective): exact fit, no optimizer drift."""
    rng = np.random.default_rng(1)
    small = set_network_properties(generate_tree(max_depth=5, rng=rng),
                                   k_value=1.852, rng=rng)
    out = tp_fit_solve_study(small, small.radius * 0.9, num_timesteps=2,
                             partitions=PARTS)
    assert out["success"]
    row = out["timesteps"][0]
    fixed = (small.degree == 1) | small.is_entry_node()
    bp = np.where(fixed, row["pressure"], 0.0)
    E = small.num_edges
    _cross_check(small, bp, row["pressure"], row["velocityPressure"][:E])
    # signed-flow audit is clean even where the |v|-audit is not
    rep = row["validation"]
    assert "flow_audit_note" in rep
    assert rep["flow_signed_summary"]["max"] < 1e-6
    assert rep["n_reversed_edges"] >= 0


def test_gbm_test4_matches_reference_protocol():
    rng = np.random.default_rng(2)
    small = set_network_properties(generate_tree(max_depth=5, rng=rng),
                                   k_value=1.852, rng=rng)
    out = gbm_test4(small, partitions=PARTS,
                    partition_to_perturb=("LMCA",))
    assert out["success"]
    fixed = (small.degree == 1) | small.is_entry_node()
    bp = np.where(fixed, out["pressure"], 0.0)
    net_t = small.replace(radius=out["perturbed_radius"])
    from arterynetwork_tpu.flow.adan import set_network_ck
    net_t = set_network_ck(net_t)
    E = small.num_edges
    _cross_check(net_t, bp, out["pressure"], out["velocityPressure"][:E])
