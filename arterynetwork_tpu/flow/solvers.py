"""Network flow solvers.

The reference solves the Hazen-Williams network by scipy ``basinhopping``
over BFGS on a magnified residual (fluidSimulation.py:1876-1878, 2268) —
1e4-1e5 Python-loop objective evaluations per timestep.  Here the system is
solved *exactly* by damped Newton on the pressure formulation:

With boundary pressures prescribed at entry and terminal nodes, the unknown
interior pressures ``p`` satisfy flow conservation

    r_n(p) = sum_in Q_e - sum_out Q_e = 0,
    Q_e    = sign(dP_e) * (A_e |dP_e|)^(1/k_e),   dP_e = p_head - p_tail

which is a monotone nonlinear resistive network: the Jacobian is a weighted
graph Laplacian (symmetric positive definite M-matrix), so damped Newton
converges globally and the solution is unique.  For ``k = 1`` (Poiseuille)
the first Newton step is exact — a single graph-Laplacian solve, matching
the BASELINE "graph-Laplacian CG pressure solve" formulation.

Two linear-solver backends:
  * ``dense`` — scatter-assembled (M+1)x(M+1) Laplacian + LU; right for
    networks up to a few thousand interior nodes (runs on the MXU).
  * ``cg``    — matrix-free Jacobi-preconditioned conjugate gradient via
    ``segment_sum`` SpMV; scales to very large graphs and shards cleanly.

Everything is jit-compatible; ``jax.vmap`` over boundary pressures / radii
gives batched longitudinal solves (GBMTest5 semantics) for free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .physics import edge_admittance, velocity_from_flow
from .system import FlowSystem

_DP_EPS = 1e-9  # Pa; regularizes dQ/d(dP) at dP = 0


class FlowSolution(NamedTuple):
    pressure: jax.Array       # f[N] full node pressures (Pa)
    flow: jax.Array           # f[E] signed flow, positive head->tail (m^3/s)
    velocity: jax.Array       # f[E] signed velocity (m/s)
    residual_norm: jax.Array  # scalar, max |net nodal flow| (m^3/s)
    iterations: jax.Array     # scalar int


def _two_sum(a, b):
    """Knuth error-free transform: a + b == s + err exactly in IEEE RN."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _signed_flow_and_weight(dp, adm, k):
    """Q(dp) and the linearization weight, both well-defined at dp=0.

    The weight is the SECANT conductance Q/dP, not the tangent dQ/d(dP):
    Hazen-Williams balances contain k-th-root modes (|x|^(1/k) with
    infinite slope at the root) on which tangent Newton oscillates forever
    at ratio |1-k|^(1/k) (~0.917 for k=1.852, measured), while the secant
    fixed point is exact on those modes and contracts at ~(1-1/k)=0.46 on
    smooth ones.  This is the classic pipe-network linearization."""
    mag = jnp.maximum(jnp.abs(dp), _DP_EPS)
    q_over_dp = adm ** (1.0 / k) * mag ** (1.0 / k - 1.0)
    q = q_over_dp * dp
    return q, q_over_dp


def _node_residual(p_unknown, system: FlowSystem, adm):
    """Net outflow at unknown-pressure nodes (conservation residual)."""
    p_full = system.full_pressure(p_unknown)
    dp = p_full[system.head] - p_full[system.tail]
    q, w = _signed_flow_and_weight(dp, adm, system.k)
    M = system.num_unknown_pressures
    slot = system.node_unknown_index  # M for fixed nodes
    net = jnp.zeros(M + 1, q.dtype)
    net = net.at[slot[system.tail]].add(q)      # inflow
    net = net.at[slot[system.head]].add(-q)     # outflow
    return net[:M], q, w


def _dense_laplacian_solve(system: FlowSystem, w, rhs):
    M = system.num_unknown_pressures
    slot = system.node_unknown_index
    hu = slot[system.head]
    tu = slot[system.tail]
    L = jnp.zeros((M + 1, M + 1), w.dtype)
    L = L.at[hu, hu].add(w).at[tu, tu].add(w)
    L = L.at[hu, tu].add(-w).at[tu, hu].add(-w)
    A = L[:M, :M] + jnp.eye(M, dtype=w.dtype) * (1e-12 * jnp.max(w))
    return jnp.linalg.solve(A, rhs)


def _cg_laplacian_solve(system: FlowSystem, w, rhs, tol=None, maxiter=None):
    """Matrix-free CG on the symmetrically diagonal-scaled Laplacian.

    Explicit D^-1/2 L D^-1/2 scaling (rather than Jacobi preconditioning
    alone) keeps the iteration well-behaved in f32: Hazen-Williams tangent
    conductances span ~7 orders of magnitude across a deep arterial tree.
    """
    M = system.num_unknown_pressures
    slot = system.node_unknown_index
    hu = slot[system.head]
    tu = slot[system.tail]
    dtype = w.dtype

    if tol is None:
        # inexact Newton: loose inner solves converge better in f32
        # (measured 4.5e-6 vs 1.5e-4 final relative error on a 16k-edge
        # tree) and cost less
        tol = 1e-4 if dtype == jnp.float32 else 1e-12
    if maxiter is None:
        maxiter = min(8 * M + 64, 192 if dtype == jnp.float32 else 2048)

    diag = jnp.zeros(M + 1, dtype).at[hu].add(w).at[tu].add(w)[:M]
    dinv_sqrt = jax.lax.rsqrt(jnp.maximum(diag, 1e-38))
    ds_pad = jnp.concatenate([dinv_sqrt, jnp.zeros((1,), dtype)])
    ridge = 1e-7 if dtype == jnp.float32 else 1e-13

    def matvec(y):
        # x = D^-1/2 y; compute D^-1/2 L x
        xp = ds_pad * jnp.concatenate([y, jnp.zeros((1,), dtype)])
        dx = xp[hu] - xp[tu]
        out = jnp.zeros(M + 1, dtype)
        out = out.at[hu].add(w * dx).at[tu].add(-w * dx)
        return ds_pad[:M] * out[:M] + ridge * y

    b_scaled = dinv_sqrt * rhs
    y, _ = jax.scipy.sparse.linalg.cg(matvec, b_scaled, tol=tol,
                                      maxiter=maxiter)
    return dinv_sqrt * y


@functools.partial(jax.jit, static_argnames=("max_iter", "linear_solver",
                                              "refine_steps", "restarts"))
def solve_pressure_newton(
    system: FlowSystem,
    p_init: jax.Array | None = None,
    max_iter: int = 60,
    tol: float = 1e-14,
    linear_solver: str = "dense",
    plan=None,
    refine_steps: int | None = None,
    restarts: int = 0,
) -> FlowSolution:
    """Damped Newton solve for interior pressures, then flows/velocities.

    ``tol`` is on the max nodal flow imbalance in m^3/s (1e-14 m^3/s =
    1e-8 cm^3/s, far below the reference's accepted errors).

    ``restarts``: bounded multi-start escape (the reference's
    basinhopping slot): when the primary solve stalls above the
    dtype's stall floor, up to this many re-solves from randomly
    rescaled inits run and the best-residual basin wins.  Off by
    default — keep it 0 under vmap (both cond branches execute there).

    ``refine_steps`` appends compensated (double-single) Newton
    iterations after convergence: pressures are carried as an exact
    f32 hi+lo pair and the edge pressure drops are formed with
    error-free two-sum transforms, so the residual — and therefore the
    correction — is resolved below the f32 rounding floor where plain
    f32 Newton stalls (the dp = p_head - p_tail cancellation loses
    ~eps*|p| per edge).  Default: 2 steps for f32 systems (closes the
    on-device pressure parity to <=1e-6 relative, the BASELINE.md:21
    target; TPU has no f64), 0 for f64 (already at 1e-10).
    """
    adm = edge_admittance(system.radius_m, system.length_m, system.c, system.k)
    dtype = system.radius_m.dtype
    M = system.num_unknown_pressures

    # Shift pressures to drop-from-reference variables: edge dP values can
    # be 1e6x smaller than absolute pressures, so subtracting a reference
    # before the solve removes most of the f32 cancellation error.
    fixed_vals_all = jnp.where(system.node_fixed, system.node_fixed_pressure,
                               jnp.nan)
    p_ref = 0.5 * (jnp.nanmax(fixed_vals_all) + jnp.nanmin(fixed_vals_all))
    import dataclasses as _dc
    system = _dc.replace(
        system,
        node_fixed_pressure=jnp.where(
            system.node_fixed, system.node_fixed_pressure - p_ref, 0.0
        ).astype(dtype))

    if p_init is None:
        # Depth-interpolated initial guess (reference init style,
        # fluidSimulation.py:1852): pressures fall linearly with depth from
        # the max to the min prescribed boundary pressure.  A good warm
        # start keeps the f32 path well-conditioned.
        fixed_vals = jnp.where(system.node_fixed, system.node_fixed_pressure,
                               jnp.nan)
        hi = jnp.nanmax(fixed_vals)
        lo = jnp.nanmin(fixed_vals)
        depth = system.node_depth.astype(dtype)
        frac = depth / jnp.maximum(jnp.max(depth), 1.0)
        p_by_depth = hi + (lo - hi) * frac
        unknown_mask = ~system.node_fixed
        order = jnp.argsort(jnp.where(unknown_mask, system.node_arg,
                                      jnp.iinfo(jnp.int32).max))
        p_init = p_by_depth[order[:M]]
    else:
        p_init = p_init - p_ref
    p_init = p_init.astype(dtype)

    if linear_solver == "auto":
        # tree elimination is exact and O(depth) when a plan is given;
        # dense LU on the MXU wins up to a few thousand unknowns; the
        # matrix-free CG scales beyond
        if plan is not None:
            linear_solver = "tree"
        else:
            linear_solver = "dense" if M <= 4096 else "cg"
    if linear_solver == "tree":
        from .tree_solver import solve_laplacian_tree

        if plan is None:
            raise ValueError("linear_solver='tree' needs an EliminationPlan "
                             "(flow.tree_solver.plan_elimination)")

        def solve_fn(system, w, rhs):
            return solve_laplacian_tree(system, plan, w, rhs)
    else:
        solve_fn = (_dense_laplacian_solve if linear_solver == "dense"
                    else _cg_laplacian_solve)

    def norm_r(p):
        r, _, _ = _node_residual(p, system, adm)
        return jnp.max(jnp.abs(r)) if M > 0 else jnp.zeros((), dtype)

    def body(state):
        p, _, it, _ = state
        r, _, w = _node_residual(p, system, adm)
        # r = inflow - outflow, so dr/dp = -Laplacian(w); the update
        # direction solves Laplacian(w) step = +r.
        step = solve_fn(system, w, r)
        rn0 = jnp.max(jnp.abs(r))

        # Backtracking line search on the residual norm.
        def ls_cond(ls):
            alpha, done = ls
            return jnp.logical_and(~done, alpha > 1e-6)

        def ls_body(ls):
            alpha, _ = ls
            rn = norm_r(p + alpha * step)
            good = rn < rn0
            return jax.lax.cond(
                good,
                lambda: (alpha, True),
                lambda: (alpha * 0.5, False),
            )

        alpha, improved = jax.lax.while_loop(ls_cond, ls_body,
                                             (jnp.ones((), dtype), False))
        p_new = p + alpha * step
        rn_new = norm_r(p_new)
        # stalled: the line search found no improving step (numerical
        # floor reached) — stop instead of burning iterations
        stalled = (~improved) | (rn_new >= rn0 * (1.0 - 1e-6))
        return p_new, rn_new, it + 1, stalled

    def cond(state):
        _, rn, it, stalled = state
        return jnp.logical_and(jnp.logical_and(rn > tol, it < max_iter),
                               ~stalled)

    def solve_from(p0):
        return jax.lax.while_loop(
            cond, body, (p0, norm_r(p0), jnp.zeros((), jnp.int32),
                         jnp.bool_(False)))

    if M > 0:
        p_unknown, rn, it, _ = solve_from(p_init)
    else:
        p_unknown, rn, it = p_init, jnp.zeros((), dtype), jnp.zeros((), jnp.int32)

    if restarts and M > 0:
        # Multi-start escape — the robustness slot the reference fills
        # with scipy basinhopping (fluidSimulation.py:1746-1752,
        # 1876-1878).  The pressure formulation is monotone, so Newton
        # stalls only on numerical conditioning; each restart re-solves
        # from a randomly rescaled init and the best-residual basin
        # wins.  The trigger sits above the dtype's normal stall floor
        # (f32 Newton legitimately stops near ~1e-9 m^3/s before the
        # compensated refinement), so a healthy solve never pays a
        # restart.  Note for vmapped callers: lax.cond under vmap
        # executes both branches, so batched paths should keep
        # restarts=0.
        trigger = jnp.maximum(
            jnp.asarray(tol, dtype),
            jnp.asarray(1e-8 if dtype == jnp.float32 else 1e-12, dtype))

        def restart(carry, key):
            p_best, rn_best, it_tot = carry

            def do(_):
                scale = jax.random.uniform(key, p_init.shape,
                                           dtype, 0.5, 1.5)
                p2, rn2, it2, _ = solve_from(p_init * scale)
                better = rn2 < rn_best
                return (jnp.where(better, p2, p_best),
                        jnp.minimum(rn2, rn_best), it_tot + it2)

            return jax.lax.cond(rn_best > trigger, do,
                                lambda _: (p_best, rn_best, it_tot),
                                None), None

        keys = jax.random.split(jax.random.PRNGKey(restarts), restarts)
        (p_unknown, rn, it), _ = jax.lax.scan(
            restart, (p_unknown, rn, it), keys)

    if refine_steps is None:
        refine_steps = 2 if dtype == jnp.float32 else 0

    p_lo = jnp.zeros_like(p_unknown)
    if refine_steps and M > 0:
        slot = system.node_unknown_index
        hslot = slot[system.head]
        tslot = slot[system.tail]
        inv_k = 1.0 / system.k

        def ds_residual(p_hi, p_lo):
            """Residual with the pressure drop formed error-free."""
            pf_hi = system.full_pressure(p_hi)
            padded_lo = jnp.concatenate([p_lo, jnp.zeros((1,), dtype)])
            pf_lo = jnp.where(system.node_fixed, jnp.zeros((), dtype),
                              padded_lo[system.node_unknown_index])
            s, e = _two_sum(pf_hi[system.head], -pf_hi[system.tail])
            e = e + (pf_lo[system.head] - pf_lo[system.tail])
            mag = jnp.maximum(jnp.abs(s), _DP_EPS)
            w = adm ** inv_k * mag ** (inv_k - 1.0)
            q_hi = w * s
            q_lo = (w * inv_k) * e   # first order: dq/d(dp) = w/k
            netf = jnp.zeros(M + 1, dtype)
            netf = netf.at[tslot].add(q_hi).at[hslot].add(-q_hi)
            netc = jnp.zeros(M + 1, dtype)
            netc = netc.at[tslot].add(q_lo).at[hslot].add(-q_lo)
            return netf[:M] + netc[:M], w

        def refine(carry, _):
            p_hi, p_lo = carry
            r, w = ds_residual(p_hi, p_lo)
            # tangent weight dq/d(dp) = w/k: at the converged point no
            # k-th-root modes are active (the secant weight is only
            # needed for global robustness), so these steps contract
            # quadratically instead of at the secant ~(1-1/k) rate
            step = solve_fn(system, w * inv_k, r)
            hi, err = _two_sum(p_hi, step)
            lo = p_lo + err
            hi2, lo2 = _two_sum(hi, lo)   # renormalize the pair
            return (hi2, lo2), None

        (p_unknown, p_lo), _ = jax.lax.scan(
            refine, (p_unknown, p_lo), None, length=refine_steps)
        rn = jnp.max(jnp.abs(ds_residual(p_unknown, p_lo)[0]))

    p_full = system.full_pressure(p_unknown)
    dp = p_full[system.head] - p_full[system.tail]
    if refine_steps and M > 0:
        padded_lo = jnp.concatenate([p_lo, jnp.zeros((1,), dtype)])
        pf_lo = jnp.where(system.node_fixed, jnp.zeros((), dtype),
                          padded_lo[system.node_unknown_index])
        s, e = _two_sum(p_full[system.head], -p_full[system.tail])
        dp = s + (e + (pf_lo[system.head] - pf_lo[system.tail]))
    q, _ = _signed_flow_and_weight(dp, adm, system.k)
    v = velocity_from_flow(q, system.radius_m)
    return FlowSolution(pressure=p_full + p_ref, flow=q, velocity=v,
                        residual_norm=rn, iterations=it)


def solve_poiseuille(system: FlowSystem, linear_solver: str = "dense") -> FlowSolution:
    """Exact linear solve for k=1 networks (one Newton step suffices)."""
    return solve_pressure_newton(system, max_iter=3, linear_solver=linear_solver)
