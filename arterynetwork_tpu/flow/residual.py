"""Reference-parity residual and validation oracle.

``residual_reference`` reproduces ``computeNetworkDetail``
(fluidSimulation.py:4636-4728) exactly — including the asymmetric x10
penalty for head<=tail pressure inversions and the error magnification
factors — but as one fused XLA computation over index arrays instead of a
Python loop over equation dicts (the reference evaluates that loop 1e4-1e5
times per basinhopping solve).

``validate_equations`` is the counterpart of ``validateFluidEquations``
(fluidSimulation.py:1105-1196): it returns per-equation physical errors
(mmHg / cm^3 s^-1) and summary statistics instead of printing them.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    BOUNDARY_ERROR_FACTOR,
    FLOW_ERROR_FACTOR,
    PASCAL_PER_MMHG,
    PRESSURE_ERROR_FACTOR,
)
from .physics import dp_from_flow, flow_from_velocity
from .system import FlowSystem


def _split_unknowns(x: jax.Array, system: FlowSystem):
    E = system.num_edges
    velocity = x[:E]
    p_unknown = x[E:]
    p_full = system.full_pressure(p_unknown)
    return velocity, p_full


def _edge_dp_hw(velocity_abs, system: FlowSystem):
    flow = flow_from_velocity(velocity_abs, system.radius_m)
    return dp_from_flow(flow, system.radius_m, system.length_m, system.c, system.k)


def _node_net_flow(flow, system: FlowSystem):
    """Net inflow minus outflow per node (flow is positive head->tail)."""
    N = system.num_nodes
    inflow = jnp.zeros(N, flow.dtype).at[system.tail].add(flow)
    outflow = jnp.zeros(N, flow.dtype).at[system.head].add(flow)
    return inflow - outflow


def residual_reference(x: jax.Array, system: FlowSystem, error_norm: int = 0):
    """Magnified residual vector in the reference's equation order.

    error_norm = 0 returns the vector (flow eqns, pressure eqns, boundary
    eqns); otherwise returns the L-`error_norm` norm, matching
    computeNetworkDetail's ``errorNorm`` argument.
    """
    velocity, p_full = _split_unknowns(x, system)
    v_abs = jnp.abs(velocity)

    # Flow-conservation equations (fluidSimulation.py:4650-4658).
    flow = flow_from_velocity(v_abs, system.radius_m)
    net = _node_net_flow(flow, system)
    eqn_flow = jnp.abs(net[system.conserve_nodes]) * FLOW_ERROR_FACTOR

    # Pressure equations (fluidSimulation.py:4659-4691).
    dp_node = p_full[system.head] - p_full[system.tail]
    dp_hw = _edge_dp_hw(v_abs, system)
    eqn_forward = jnp.abs(dp_node - dp_hw) * 2.0
    eqn_reversed = 10.0 * jnp.abs(dp_hw - dp_node)
    eqn_pressure = jnp.where(dp_node > 0, eqn_forward, eqn_reversed)
    eqn_pressure = eqn_pressure * PRESSURE_ERROR_FACTOR

    # Inlet-velocity boundary equations (fluidSimulation.py:4694-4697).
    eqn_boundary = (velocity[system.bc_edge] - system.bc_velocity) * BOUNDARY_ERROR_FACTOR

    eqns = jnp.concatenate([eqn_flow, eqn_pressure, eqn_boundary])
    if error_norm == 0:
        return eqns
    return jnp.linalg.norm(eqns, ord=error_norm)


def validate_equations(x, system: FlowSystem,
                       signed_velocity=None) -> Dict[str, np.ndarray]:
    """Physical residual audit (validateFluidEquations parity).

    Returns a dict with per-equation true errors and summary statistics:
      * ``pressure_error_mmhg``: |dP_node - dP_HW| per edge, in mmHg
      * ``flow_error_cm3s``: |Q_in - Q_out| per conservation node, cm^3/s
      * ``n_pressure_inversions``: edges where head pressure <= tail pressure
      * summary mean/std/min/max for both error families.

    CAVEAT (surfaced as ``flow_audit_note``): the reference packs
    nonnegative velocities (bounds v in [0, 5] m/s with direction
    encoded by edge orientation), so this audit takes |v| and an edge
    whose flow physically reverses shows up as conservation "error"
    even in an exactly-converged solution.  Pass the solver's
    ``signed_velocity`` to additionally get ``flow_error_signed_cm3s``
    (the physical conservation residual) and ``n_reversed_edges``.
    """
    x = jnp.asarray(x)
    velocity, p_full = _split_unknowns(x, system)
    v_abs = jnp.abs(velocity)

    flow = flow_from_velocity(v_abs, system.radius_m)
    net = _node_net_flow(flow, system)
    flow_error = np.asarray(jnp.abs(net[system.conserve_nodes])) * 1e6  # cm^3/s

    dp_node = p_full[system.head] - p_full[system.tail]
    dp_hw = _edge_dp_hw(v_abs, system)
    pressure_error = np.asarray(jnp.abs(jnp.abs(dp_node) - dp_hw)) / PASCAL_PER_MMHG
    inversions = int(np.sum(np.asarray(dp_node) <= 0))

    def _summary(a):
        if a.size == 0:
            return dict(mean=0.0, std=0.0, min=0.0, max=0.0)
        return dict(mean=float(a.mean()), std=float(a.std()),
                    min=float(a.min()), max=float(a.max()))

# Magnified combined error, same scaling as the reference
    # (fluidSimulation.py:1157, 1181, 1191-1192).
    total = np.concatenate([pressure_error * 500.0, flow_error * 20000.0])

    out = {
        "pressure_error_mmhg": pressure_error,
        "flow_error_cm3s": flow_error,
        "n_pressure_inversions": inversions,
        "pressure_summary": _summary(pressure_error),
        "flow_summary": _summary(flow_error),
        "combined_magnified_error": float(np.linalg.norm(total)),
        "flow_audit_note": (
            "flow_error_cm3s uses |v| (the reference's packing); edges "
            "whose flow physically reverses appear as conservation error "
            "here — flow_error_signed_cm3s is the physical residual"),
    }
    if signed_velocity is not None:
        sv = jnp.asarray(signed_velocity)
        flow_s = flow_from_velocity(sv, system.radius_m)
        net_s = _node_net_flow(flow_s, system)
        err_s = np.asarray(jnp.abs(net_s[system.conserve_nodes])) * 1e6
        out["flow_error_signed_cm3s"] = err_s
        out["flow_signed_summary"] = _summary(err_s)
        out["n_reversed_edges"] = int(np.sum(np.asarray(sv) < 0))
    return out


def pack_velocity_pressure(system: FlowSystem, p_full, velocity) -> np.ndarray:
    """Pack (p, v) into the reference unknown layout [v..., p_unknown...]
    (getVelocityPressure, fluidSimulation.py:785-812)."""
    p_full = np.asarray(p_full)
    velocity = np.asarray(velocity)
    node_arg = np.asarray(system.node_arg)
    unknown_nodes = np.nonzero(node_arg >= 0)[0]
    order = np.argsort(node_arg[unknown_nodes])
    p_unknown = p_full[unknown_nodes[order]]
    return np.concatenate([velocity, p_unknown])
