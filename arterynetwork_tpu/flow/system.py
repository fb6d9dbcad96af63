"""Fluid-equation assembly as static index arrays.

Equivalent of the reference's ``setupFluidEquations``
(fluidSimulation.py:873-968), which builds a list of per-equation dicts that
are then *interpreted in Python* for every objective evaluation
(computeNetworkDetail, fluidSimulation.py:4636-4728).  Here the same
information is packed once into flat arrays so the residual is a single
fused XLA computation.

Equation inventory (same as the reference):
  * one flow-conservation equation per interior bifurcating node that has
    both incoming and outgoing branches (fluidSimulation.py:903-919);
  * one Hazen-Williams pressure equation per edge, with head/tail pressure
    either a fixed boundary value (entry node or degree-1 node) or an
    unknown (fluidSimulation.py:921-954);
  * optional inlet-velocity boundary equations (fluidSimulation.py:956-964).

Unknown layout: ``x = [v_0 .. v_{E-1}, p_{u0} .. p_{uM-1}]`` — edge
velocities in edge order followed by unknown node pressures in node order
(fluidSimulation.py:549-562).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graphs.network import FlowNetwork


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowSystem:
    """Static-shape description of the fluid equations for one network."""

    # Edge geometry/physics (SI units).
    head: jax.Array            # i32[E] node index of the head (lower depth)
    tail: jax.Array            # i32[E]
    radius_m: jax.Array        # f[E]
    length_m: jax.Array        # f[E]
    c: jax.Array               # f[E]
    k: jax.Array               # f[E]

    # Pressure bookkeeping.
    node_fixed: jax.Array      # bool[N]  True where pressure is prescribed
    node_fixed_pressure: jax.Array  # f[N]  prescribed pressure (0 elsewhere)
    node_arg: jax.Array        # i32[N]  index into x for unknown pressures, -1 if fixed
    node_unknown_index: jax.Array  # i32[N] 0..M-1 for unknowns, M for fixed (scatter slot)

    # Flow-conservation equation selection.
    conserve_nodes: jax.Array  # i32[F] nodes carrying a conservation equation

    # Optional inlet-velocity boundary equations.
    bc_edge: jax.Array         # i32[B] edge indices (may be empty)
    bc_velocity: jax.Array     # f[B]

    # Node depth (for the depth-interpolated initial guess, mirroring the
    # reference's linspace init, fluidSimulation.py:1852).
    node_depth: jax.Array      # i32[N]

    num_unknown_pressures: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_edges(self) -> int:
        return self.head.shape[0]

    @property
    def num_unknowns(self) -> int:
        return self.num_edges + self.num_unknown_pressures

    def full_pressure(self, p_unknown: jax.Array) -> jax.Array:
        """Scatter unknown pressures into the full node-pressure vector."""
        padded = jnp.concatenate([p_unknown, jnp.zeros((1,), p_unknown.dtype)])
        return jnp.where(self.node_fixed, self.node_fixed_pressure,
                         padded[self.node_unknown_index])

    def unknown_pressure_of(self, p_full: jax.Array) -> jax.Array:
        order = np.argsort(np.asarray(self.node_arg))
        unknown_nodes = order[np.asarray(self.node_arg)[order] >= 0]
        return p_full[unknown_nodes]


def apply_velocity_pressure(net: FlowNetwork, system: FlowSystem,
                            x) -> FlowNetwork:
    """Unpack the unknown vector into a network carrying the solution
    (updateNetworkWithSimulationResult, fluidSimulation.py:1519-1546):
    node pressures from the unknown slots (fixed nodes keep their
    prescribed values), per-edge velocity, and flow = v*pi*r^2."""
    x = np.asarray(jax.device_get(x), dtype=np.float64)
    E = system.num_edges
    if x.shape[0] != system.num_unknowns:
        raise ValueError("solution length != num_unknowns")
    velocity = x[:E]
    p_full = np.asarray(
        jax.device_get(system.full_pressure(jnp.asarray(x[E:]))),
        dtype=np.float64)
    flow = velocity * np.pi * np.asarray(system.radius_m) ** 2
    return net.replace(node_pressure=p_full, edge_velocity=velocity,
                       edge_flow=flow)


def build_system(
    net: FlowNetwork,
    boundary_pressure: Optional[np.ndarray] = None,
    inlet_velocity_bc: Optional[dict] = None,
    dtype=jnp.float64,
) -> FlowSystem:
    """Assemble a FlowSystem from a network.

    Parameters
    ----------
    net : FlowNetwork
        The network; ``net.node_pressure`` must hold the prescribed pressures
        at entry and terminal nodes unless ``boundary_pressure`` is given.
    boundary_pressure : array, optional
        Full node-pressure vector to read boundary values from (overrides
        ``net.node_pressure``).
    inlet_velocity_bc : dict, optional
        ``{edge_index: velocity_m_per_s}`` inlet-velocity boundary equations
        (reference ``boundaryCondition`` argument).
    """
    deg = net.degree
    N, E = net.num_nodes, net.num_edges
    is_entry = net.is_entry_node()

    fixed = (deg == 1) | is_entry
    if boundary_pressure is None:
        boundary_pressure = net.node_pressure
    if boundary_pressure is None:
        raise ValueError("boundary pressures unset: provide boundary_pressure "
                         "or set net.node_pressure at entry/terminal nodes")
    boundary_pressure = np.asarray(boundary_pressure, dtype=np.float64)
    fixed_pressure = np.where(fixed, boundary_pressure, 0.0)
    if np.any(~np.isfinite(fixed_pressure[fixed])):
        raise ValueError("non-finite boundary pressure at a fixed node")

    # Unknown pressures in node order (reference argsIndex order).
    unknown_nodes = np.nonzero(~fixed)[0]
    M = unknown_nodes.shape[0]
    node_arg = np.full(N, -1, dtype=np.int32)
    node_arg[unknown_nodes] = E + np.arange(M, dtype=np.int32)
    node_unknown_index = np.full(N, M, dtype=np.int32)
    node_unknown_index[unknown_nodes] = np.arange(M, dtype=np.int32)

    # Conservation equations: unknown-pressure nodes having at least one
    # in-edge (node is tail) and one out-edge (node is head)
    # (fluidSimulation.py:903-919).
    n_in = np.zeros(N, dtype=np.int32)
    n_out = np.zeros(N, dtype=np.int32)
    np.add.at(n_in, net.tails, 1)
    np.add.at(n_out, net.heads, 1)
    conserve = np.nonzero((~fixed) & (n_in > 0) & (n_out > 0))[0].astype(np.int32)

    if inlet_velocity_bc:
        bc_edge = np.asarray(sorted(inlet_velocity_bc.keys()), dtype=np.int32)
        bc_velocity = np.asarray([inlet_velocity_bc[int(e)] for e in bc_edge])
    else:
        bc_edge = np.zeros((0,), dtype=np.int32)
        bc_velocity = np.zeros((0,))

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    system = FlowSystem(
        head=np.asarray(net.heads, dtype=np.int32),
        tail=np.asarray(net.tails, dtype=np.int32),
        radius_m=np.asarray(net.radius_m(), dtype=np_dtype),
        length_m=np.asarray(net.length_m(), dtype=np_dtype),
        c=np.asarray(net.c, dtype=np_dtype),
        k=np.asarray(net.k, dtype=np_dtype),
        node_fixed=np.asarray(fixed),
        node_fixed_pressure=np.asarray(fixed_pressure, dtype=np_dtype),
        node_arg=np.asarray(node_arg),
        node_unknown_index=np.asarray(node_unknown_index),
        conserve_nodes=np.asarray(conserve),
        bc_edge=np.asarray(bc_edge),
        bc_velocity=np.asarray(bc_velocity, dtype=np_dtype),
        node_depth=np.asarray(net.node_depth, dtype=np.int32),
        num_unknown_pressures=int(M),
        num_nodes=int(N),
    )
    # one batched transfer for the whole pytree: per-array device_put pays
    # a full link round trip each on the tunneled backend (~14 arrays)
    return jax.device_put(system)
