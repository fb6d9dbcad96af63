"""Flow-distribution optimizer — the reference's unfinished distributeFlow slot.

Reference: ``fluidSimulation.py:1053`` (``setupEquationsForDistributeFlow``),
``:2758`` (``distributeFlowTest``) and ``:4730`` (``distributeFlowDetail``),
all of which carry "Unfinished!" docstrings.  The intended semantics (read
from the partial code): each edge gets a *split fraction* ``args[edgeIndex]``
in [0, 1] of the flow arriving at its head node; flows propagate down the
depth-ordered network with Hazen-Williams pressure drops
(``dP = 10.67 Q^k L / c^k D^4.8704``); merging nodes reconcile the several
arriving pressures "by optimization"; and the fractions are chosen so the
resulting terminating pressures match desired values (the reference
hard-codes ``13560*9.8*0.12`` Pa).

This module finishes that design TPU-first:

* **Constraints by construction, not by penalty.**  One unconstrained logit
  per edge; the fractions are a per-head-node segment softmax, so sibling
  fractions always sum to 1 and live in (0, 1) — the box bounds and the
  conservation constraint the reference would have had to feed a bounded
  optimizer are structural.
* **Static level-synchronous propagation.**  The forward pass is a
  ``lax.scan`` over depth levels with padded per-level edge tables (static
  shapes, no data-dependent Python control flow under ``jit``).  An edge's
  level is its head-node depth, so every node's pressure is final before its
  out-edges are processed — including DAG merge nodes, whose pressure is the
  flow-weighted mean of the arriving branch pressures.
* **Damped Gauss-Newton.**  The residual stacks (terminating pressure −
  desired) with the per-edge merge-consistency gap (arriving branch pressure
  − merged node pressure; identically zero on trees).  Problems are small
  (E ≲ a few thousand), so a dense ``jacfwd`` + Levenberg-damped normal
  equation solve converges in a handful of iterations; the damping also
  absorbs the softmax's per-group logit-shift null space.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (HW_COEFF, HW_DIAMETER_EXPONENT, INLET_PRESSURE,
                         PASCAL_PER_MMHG)
from ..graphs.network import FlowNetwork

# the reference's desired terminating pressure (fluidSimulation.py:1100)
# — the same 13560*9.8*0.12 Pa as the inlet constant
DEFAULT_DESIRED_TERMINATING_PRESSURE = INLET_PRESSURE
_MMHG = PASCAL_PER_MMHG


def _default_dtype():
    """f32 on the TPU backend (this device has no working f64 — LU
    errors, general f64 compute faults it; CLAUDE.md), f64 elsewhere
    (the CPU test mesh keeps the high-precision oracle path)."""
    return (jnp.float32 if jax.default_backend() == "tpu"
            else jnp.float64)


class DistributeSystem(NamedTuple):
    """Static-shape description of the split-fraction problem.

    Per-level tables are padded to the widest level with ``valid == 0``
    rows (clipped indices + zeroed contributions keep the scatter-adds
    inert), mirroring ``distributeFlowEqnDict['connectInfoDictList']``'s
    depth-sorted edge walk (fluidSimulation.py:1077-1090).
    """

    level_edge: jax.Array     # int32[L, W]  edge index (clipped at pad)
    level_head: jax.Array     # int32[L, W]
    level_tail: jax.Array     # int32[L, W]
    level_valid: jax.Array    # f[L, W]      1.0 on real rows
    dp_coeff: jax.Array       # f[E]  10.67 L / (c^k D^4.8704)
    k: jax.Array              # f[E]
    heads: jax.Array          # int32[E]     for the sibling softmax
    tails: jax.Array          # int32[E]
    merge_weight: jax.Array   # f[E]  1.0 on edges entering a merge node
    terminal_nodes: jax.Array  # int32[T]
    desired_pressure: jax.Array  # f[T]  Pa
    root: int
    inlet_flow: float         # m^3/s
    inlet_pressure: float     # Pa
    num_nodes: int

    @property
    def num_edges(self) -> int:
        return int(self.dp_coeff.shape[0])


def build_distribute_system(
    net: FlowNetwork,
    inlet_flow: float,
    inlet_pressure: float,
    desired_terminating_pressure=None,
    dtype=None,
) -> DistributeSystem:
    """Assemble the padded level tables from a ``FlowNetwork``.

    Mirrors ``setupEquationsForDistributeFlow`` (fluidSimulation.py:1053):
    edges sorted by depth, merge nodes = nodes with >1 lower-depth
    neighbor, desired terminating pressure defaulting to the reference's
    hard-coded value at every degree-1 non-entry node.  ``dtype=None``
    picks f32 on TPU (no f64 there) and f64 elsewhere.
    """
    if dtype is None:
        dtype = _default_dtype()
    heads = np.asarray(net.heads, dtype=np.int64)
    tails = np.asarray(net.tails, dtype=np.int64)
    depth = np.asarray(net.node_depth, dtype=np.int64)
    E = heads.shape[0]

    # the level-synchronous scan finalizes a node's pressure before its
    # out-edges run, which requires every edge to strictly descend the
    # depth field — the same precondition as the reference's depth
    # sweep.  A cross edge (equal depths, e.g. from a skeleton loop)
    # would read its tail's inflow mid-level and silently misroute flow,
    # so reject it loudly instead.
    if E and not (depth[heads] < depth[tails]).all():
        bad = int((depth[heads] >= depth[tails]).sum())
        raise ValueError(
            f"distribute_flow needs a depth-acyclic network: {bad} "
            "edge(s) do not strictly descend the depth field (loopy "
            "skeletons are out of this solver's scope, as they are for "
            "the reference's depth sweep — use flow.solvers on those)")

    level_of_edge = depth[heads]
    n_levels = int(level_of_edge.max()) + 1 if E else 1
    order = np.argsort(level_of_edge, kind="stable")
    width = max(int(np.bincount(level_of_edge, minlength=n_levels).max()), 1)

    le = np.zeros((n_levels, width), dtype=np.int32)
    lh = np.zeros((n_levels, width), dtype=np.int32)
    lt = np.zeros((n_levels, width), dtype=np.int32)
    lv = np.zeros((n_levels, width), dtype=np.float64)
    fill = np.zeros(n_levels, dtype=np.int64)
    for e in order:
        lvl = level_of_edge[e]
        j = fill[lvl]
        le[lvl, j], lh[lvl, j], lt[lvl, j] = e, heads[e], tails[e]
        lv[lvl, j] = 1.0
        fill[lvl] += 1

    in_degree = np.bincount(tails, minlength=net.num_nodes)
    merge_weight = (in_degree[tails] > 1).astype(np.float64)

    terminals = np.asarray(net.terminal_nodes(), dtype=np.int64)
    if desired_terminating_pressure is None:
        desired = np.full(terminals.shape,
                          DEFAULT_DESIRED_TERMINATING_PRESSURE)
    else:
        desired = np.broadcast_to(
            np.asarray(desired_terminating_pressure, dtype=np.float64),
            terminals.shape).copy()

    radius_m = np.asarray(net.radius_m(), dtype=np.float64)
    length_m = np.asarray(net.length_m(), dtype=np.float64)
    c = np.asarray(net.c, dtype=np.float64)
    k = np.asarray(net.k, dtype=np.float64)
    dp_coeff = (HW_COEFF * length_m
                / c ** k / (2.0 * radius_m) ** HW_DIAMETER_EXPONENT)

    root = int(net.entry_nodes[0]) if len(net.entry_nodes) else 0
    return DistributeSystem(
        level_edge=jnp.asarray(le),
        level_head=jnp.asarray(lh),
        level_tail=jnp.asarray(lt),
        level_valid=jnp.asarray(lv, dtype=dtype),
        dp_coeff=jnp.asarray(dp_coeff, dtype=dtype),
        k=jnp.asarray(k, dtype=dtype),
        heads=jnp.asarray(heads, dtype=jnp.int32),
        tails=jnp.asarray(tails, dtype=jnp.int32),
        merge_weight=jnp.asarray(merge_weight, dtype=dtype),
        terminal_nodes=jnp.asarray(terminals, dtype=jnp.int32),
        desired_pressure=jnp.asarray(desired, dtype=dtype),
        root=root,
        inlet_flow=float(inlet_flow),
        inlet_pressure=float(inlet_pressure),
        num_nodes=net.num_nodes,
    )


def split_fractions(theta: jax.Array, system: DistributeSystem) -> jax.Array:
    """Per-head-node segment softmax: sibling fractions sum to 1."""
    t = theta - jax.ops.segment_max(theta, system.heads,
                                    num_segments=system.num_nodes,
                                    indices_are_sorted=False)[system.heads]
    ex = jnp.exp(t)
    denom = jax.ops.segment_sum(ex, system.heads,
                                num_segments=system.num_nodes)[system.heads]
    return ex / denom


def propagate(theta: jax.Array, system: DistributeSystem):
    """Forward pass: level-synchronous flow + pressure propagation.

    Returns ``(node_pressure[N], node_inflow[N], edge_flow[E],
    edge_tail_pressure[E])`` — the last being each edge's arriving
    pressure before merge reconciliation (distributeFlowDetail's
    ``tailPressure``, fluidSimulation.py:4747).
    """
    dtype = system.dp_coeff.dtype
    frac = split_fractions(theta, system)
    N = system.num_nodes

    inflow0 = jnp.zeros(N, dtype).at[system.root].set(system.inlet_flow)
    pnum0 = jnp.zeros(N, dtype).at[system.root].set(
        system.inlet_flow * system.inlet_pressure)
    eflow0 = jnp.zeros(system.num_edges, dtype)
    ptail0 = jnp.zeros(system.num_edges, dtype)

    def level_step(state, tbl):
        inflow, pnum, eflow, ptail = state
        eid, h, t, valid = tbl
        # head pressures are final: every in-edge has a lower level
        p_head = pnum[h] / jnp.maximum(inflow[h], jnp.finfo(dtype).tiny)
        q = inflow[h] * frac[eid] * valid
        dp = system.dp_coeff[eid] * jnp.abs(q) ** system.k[eid]
        p_cand = p_head - dp
        inflow = inflow.at[t].add(q)
        pnum = pnum.at[t].add(q * p_cand)
        eflow = eflow.at[eid].add(q)  # pads clip to edge 0: add 0
        ptail = ptail.at[eid].add(p_cand * valid)
        return (inflow, pnum, eflow, ptail), None

    (inflow, pnum, eflow, ptail), _ = jax.lax.scan(
        level_step, (inflow0, pnum0, eflow0, ptail0),
        (system.level_edge, system.level_head, system.level_tail,
         system.level_valid))
    pressure = pnum / jnp.maximum(inflow, jnp.finfo(dtype).tiny)
    pressure = pressure.at[system.root].set(system.inlet_pressure)
    return pressure, inflow, eflow, ptail


def residuals(theta: jax.Array, system: DistributeSystem,
              merge_scale: float = 100.0) -> jax.Array:
    """[terminal pressure mismatch; merge-consistency gap], in mmHg.

    ``merge_scale`` weights the merge gap: arriving branch pressures at a
    physical junction MUST agree, while the desired terminating pressures
    are targets to approach — so when the targets are infeasible the
    optimizer must sacrifice them, not junction consistency."""
    pressure, _, _, ptail = propagate(theta, system)
    r_term = (pressure[system.terminal_nodes]
              - system.desired_pressure) / _MMHG
    # per-edge arriving pressure vs the merged node pressure (zero unless
    # the tail is a merge node) — the reference's two-pressure list that
    # "optimization" was meant to reconcile (fluidSimulation.py:4749-4752)
    r_merge = ((ptail - pressure[system.tails])
               * system.merge_weight * merge_scale / _MMHG)
    return jnp.concatenate([r_term, r_merge])


class DistributeResult(NamedTuple):
    fractions: jax.Array        # f[E] split fraction per edge
    edge_flow: jax.Array        # f[E] m^3/s
    node_pressure: jax.Array    # f[N] Pa
    residual_norm: jax.Array    # RMS terminal mismatch, mmHg
    iterations: jax.Array
    theta: jax.Array


def distribute_flow(
    system: DistributeSystem,
    max_iter: int = 40,
    tol_mmhg: float = 1e-9,
    init_theta: Optional[jax.Array] = None,
) -> DistributeResult:
    """Solve for split fractions by Levenberg-damped Gauss-Newton.

    Completes ``distributeFlowTest`` (fluidSimulation.py:2758): "find a way
    (by optimization) to distribute the flow ... such that the resulting
    terminating pressures match the desired values".
    """
    E = system.num_edges
    dtype = system.dp_coeff.dtype
    theta0 = (jnp.zeros(E, dtype) if init_theta is None
              else jnp.asarray(init_theta, dtype))

    res_fn = lambda th: residuals(th, system)

    def gn_step(state, _):
        theta, lam, _ = state
        r = res_fn(theta)
        J = jax.jacfwd(res_fn)(theta)
        g = J.T @ r
        H = J.T @ J

        def try_lambda(lam):
            delta = jnp.linalg.solve(
                H + lam * jnp.eye(E, dtype=dtype), -g)
            r_new = res_fn(theta + delta)
            return delta, jnp.sum(r_new ** 2)

        cost = jnp.sum(r ** 2)
        d1, c1 = try_lambda(lam)
        d2, c2 = try_lambda(lam * 10.0)
        use1 = c1 <= c2
        delta = jnp.where(use1, d1, d2)
        new_cost = jnp.where(use1, c1, c2)
        accept = new_cost <= cost
        theta = jnp.where(accept, theta + delta, theta)
        lam = jnp.where(accept,
                        jnp.where(use1, lam * 0.3, lam * 3.0),
                        lam * 10.0)
        lam = jnp.clip(lam, 1e-12, 1e8)
        return (theta, lam, jnp.sqrt(new_cost / max(r.shape[0], 1))), None

    lam0 = jnp.asarray(1e-3, dtype)
    (theta, _, rms), _ = jax.lax.scan(
        gn_step, (theta0, lam0, jnp.asarray(jnp.inf, dtype)),
        None, length=max_iter)

    pressure, _, eflow, _ = propagate(theta, system)
    r_term = (pressure[system.terminal_nodes]
              - system.desired_pressure) / _MMHG
    rms_term = jnp.sqrt(jnp.mean(r_term ** 2))
    return DistributeResult(
        fractions=split_fractions(theta, system),
        edge_flow=eflow,
        node_pressure=pressure,
        residual_norm=rms_term,
        iterations=jnp.asarray(max_iter),
        theta=theta,
    )


def distribute_flow_study(
    net: FlowNetwork,
    inlet_flow: Optional[float] = None,
    inlet_pressure: Optional[float] = None,
    desired_terminating_pressure=None,
    max_iter: int = 40,
    dtype=None,
) -> dict:
    """The ``distributeFlowTest`` entry point (fluidSimulation.py:2758).

    Defaults the inlet boundary from the network's ground-truth-style
    state when present (``edge_flow``/``node_pressure``), else from a
    nominal 750 ml/min cerebral inflow at 100 mmHg.
    """
    root = int(net.entry_nodes[0]) if len(net.entry_nodes) else 0
    if inlet_flow is None:
        if net.edge_flow is not None:
            out_of_root = (np.asarray(net.heads) == root)
            inlet_flow = float(np.abs(
                np.asarray(net.edge_flow)[out_of_root]).sum())
        else:
            inlet_flow = 750e-6 / 60.0  # 750 ml/min in m^3/s
    if inlet_pressure is None:
        if net.node_pressure is not None:
            inlet_pressure = float(np.asarray(net.node_pressure)[root])
        else:
            inlet_pressure = 100.0 * _MMHG  # 100 mmHg in Pa

    system = build_distribute_system(
        net, inlet_flow=inlet_flow, inlet_pressure=inlet_pressure,
        desired_terminating_pressure=desired_terminating_pressure,
        dtype=dtype)
    result = distribute_flow(system, max_iter=max_iter)
    term_p = np.asarray(result.node_pressure)[
        np.asarray(system.terminal_nodes)]
    return {
        "result": result,
        "system": system,
        "fractions": np.asarray(result.fractions),
        "edge_flow": np.asarray(result.edge_flow),
        "terminal_pressure_mmhg": term_p / _MMHG,
        "desired_pressure_mmhg": np.asarray(system.desired_pressure) / _MMHG,
        "rms_mismatch_mmhg": float(result.residual_norm),
    }
