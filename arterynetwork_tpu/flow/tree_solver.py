"""Direct graph-Laplacian solver by parallel tree elimination.

Vascular networks are trees plus a handful of Circle-of-Willis loops, so
the Newton linear systems (weighted Laplacians on the unknown-pressure
nodes) admit a *perfect elimination order*: repeatedly strip degree-1
unknowns (all strips within a round run data-parallel), dense-solve the
tiny remaining 2-core (the loop nodes; empty for pure trees), then
back-substitute in reverse.  Zero fill-in, exact in one pass —
O(tree depth) parallel rounds instead of thousands of CG iterations
(measured: the 16k-edge CG path costs ~1.5 s/solve on this backend).

The elimination *structure* depends only on the graph, so it is planned
once on the host (`plan_elimination`) and reused for every Newton
iteration / longitudinal timestep with different weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .system import FlowSystem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EliminationPlan:
    """Static per-round elimination schedule (padded to max round size).

    Per eliminated unknown v (slot in round r): its unknown-graph parent
    p(v) and the index of the connecting edge (for the weight gather).
    Padded slots point at node M / edge E sentinels with valid=False.
    """
    elim_nodes: jax.Array    # i32[R, W] unknown-index of eliminated node
    parents: jax.Array       # i32[R, W] unknown-index of its parent
    edge_idx: jax.Array      # i32[R, W] edge connecting them
    valid: jax.Array         # bool[R, W]
    core_nodes: jax.Array    # i32[C] unknown-indices of the 2-core
    core_slot: jax.Array     # i32[M+1] position of each unknown in core, C if none
    num_rounds: int = dataclasses.field(metadata=dict(static=True))
    core_size: int = dataclasses.field(metadata=dict(static=True))


def plan_elimination(system: FlowSystem) -> Optional[EliminationPlan]:
    """Host-side planning.  Returns None for systems with no unknowns."""
    M = system.num_unknown_pressures
    if M == 0:
        return None
    slot = np.asarray(system.node_unknown_index)
    hu = slot[np.asarray(system.head)]
    tu = slot[np.asarray(system.tail)]
    E = hu.shape[0]

    # adjacency among unknowns only
    adj = [[] for _ in range(M)]
    for e in range(E):
        a, b = int(hu[e]), int(tu[e])
        if a < M and b < M:
            adj[a].append((b, e))
            adj[b].append((a, e))

    degree = np.array([len(a) for a in adj])
    removed = np.zeros(M, dtype=bool)
    rounds = []
    while True:
        leaves = [v for v in range(M)
                  if not removed[v] and degree[v] <= 1]
        if not leaves:
            break
        entries = []
        for v in leaves:
            nbrs = [(p, e) for (p, e) in adj[v] if not removed[p]]
            if not nbrs:
                # isolated unknown (only fixed neighbors): solve directly
                entries.append((v, M, E))
            else:
                p, e = nbrs[0]
                entries.append((v, p, e))
        for v, p, e in entries:
            removed[v] = True
            if p < M:
                degree[p] -= 1
        rounds.append(entries)

    core = [v for v in range(M) if not removed[v]]
    C = len(core)
    core_slot = np.full(M + 1, C, dtype=np.int32)
    for i, v in enumerate(core):
        core_slot[v] = i

    R = max(len(rounds), 1)
    W = max((len(r) for r in rounds), default=1)
    elim = np.full((R, W), M, dtype=np.int32)
    par = np.full((R, W), M, dtype=np.int32)
    eidx = np.full((R, W), E, dtype=np.int32)
    valid = np.zeros((R, W), dtype=bool)
    for r, entries in enumerate(rounds):
        for i, (v, p, e) in enumerate(entries):
            elim[r, i] = v
            par[r, i] = p
            eidx[r, i] = e
            valid[r, i] = True

    return EliminationPlan(
        elim_nodes=jnp.asarray(elim), parents=jnp.asarray(par),
        edge_idx=jnp.asarray(eidx), valid=jnp.asarray(valid),
        core_nodes=jnp.asarray(np.asarray(core, dtype=np.int32)),
        core_slot=jnp.asarray(core_slot),
        num_rounds=R, core_size=C)


def solve_laplacian_tree(system: FlowSystem, plan: EliminationPlan,
                         w, rhs):
    """Solve Laplacian(w) x = rhs exactly via the elimination plan.

    w: f[E] edge weights; rhs: f[M].  The Laplacian diagonal includes
    edges to fixed-pressure nodes (their unknowns were substituted into
    the rhs by the caller)."""
    M = system.num_unknown_pressures
    E = w.shape[0]
    dtype = w.dtype
    slot = system.node_unknown_index
    hu = slot[system.head]
    tu = slot[system.tail]

    # initial diagonal: all incident edge weights (fixed neighbors too)
    d = jnp.zeros(M + 1, dtype).at[hu].add(w).at[tu].add(w)[:M]
    d = jnp.concatenate([d, jnp.ones((1,), dtype)])       # sentinel
    b = jnp.concatenate([rhs.astype(dtype), jnp.zeros((1,), dtype)])
    w_pad = jnp.concatenate([w, jnp.zeros((1,), dtype)])

    # ---- forward elimination ----
    def fwd(carry, round_data):
        d, b = carry
        ev, pv, ee, val = round_data
        wv = w_pad[ee]
        dv = jnp.where(val, d[ev], 1.0)
        factor = jnp.where(val, wv / dv, 0.0)
        d = d.at[pv].add(-factor * wv)
        b = b.at[pv].add(factor * b[ev])
        return (d, b), None

    (d, b), _ = jax.lax.scan(
        fwd, (d, b),
        (plan.elim_nodes, plan.parents, plan.edge_idx, plan.valid))

    # ---- core solve (loops) ----
    x = jnp.zeros(M + 1, dtype)
    if plan.core_size > 0:
        C = plan.core_size
        cs = plan.core_slot
        chu = cs[hu]
        ctu = cs[tu]
        both = (chu < C) & (ctu < C)
        wc = jnp.where(both, w_pad[:E], 0.0)
        L = jnp.zeros((C + 1, C + 1), dtype)
        L = L.at[jnp.diag_indices(C + 1)].add(0.0)
        # diagonal comes from the eliminated d values at core nodes
        L = L.at[jnp.arange(C), jnp.arange(C)].add(d[plan.core_nodes])
        L = L.at[chu, ctu].add(-wc).at[ctu, chu].add(-wc)
        A = L[:C, :C]
        xc = jnp.linalg.solve(
            A + jnp.eye(C, dtype=dtype) * (1e-12 * jnp.max(w) + 1e-30),
            b[plan.core_nodes])
        x = x.at[plan.core_nodes].set(xc)

    # ---- back substitution ----
    def bwd(carry, round_data):
        x = carry
        ev, pv, ee, val = round_data
        wv = w_pad[ee]
        dv = jnp.where(val, d[ev], 1.0)
        xv = (b[ev] + wv * x[pv]) / dv
        x = x.at[ev].set(jnp.where(val, xv, x[ev]))
        return x, None

    x, _ = jax.lax.scan(
        bwd, x,
        (plan.elim_nodes[::-1], plan.parents[::-1],
         plan.edge_idx[::-1], plan.valid[::-1]))
    return x[:M]
