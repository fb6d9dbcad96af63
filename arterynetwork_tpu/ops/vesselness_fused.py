"""Fused Frangi response kernel: Hessian + eigenvalues + tubularity in
one Pallas pass over the smoothed field.

The XLA apply path (ops/vesselness.py:_apply_chunk*) evaluates the
difference stencils, the closed-form eigenvalues and the response as
separate HBM passes per scale: 2 banded matmuls (x-axis stencils),
7 shifted-slice passes, and the eigen/response fusion — each reading and
writing full-slab f32 temporaries.  This kernel computes the response
tile-by-tile from ONE read of the smoothed field: a (TZ+4, TYB+16, Xp)
box is DMA'd into VMEM, all six Hessian components are formed with
in-register shifts (z via static axis-0 slices, y/x via ``pltpu.roll`` —
wrap-around garbage lands in halo rows/lanes the interior never reads),
the eigen/response math runs on the VPU, and only the (TZ, TYB, X)
interior is written back.  HBM traffic per scale drops from ~12 slab
r/w passes to 2 (read smoothed, write response).

Edge semantics match the XLA path exactly: the wrapper pads the
smoothed field with *edge-replicated* rows/columns, which is precisely
the replication the `_d_shift` / `_diff_matrix` stencils encode at the
volume faces; interior halos come from the real neighboring rows.

Like the banded region-grow sweep, this backend is OPT-IN
(``fused_response`` config / explicit call) until the remote AOT
compiler proves it at the target shapes; interpret-mode parity against
the XLA apply path is ~1e-5 absolute (the eigen cosines come from a
Newton solve of the triple-angle cubic — Mosaic implements neither
``acos`` nor ``cos`` — accurate to the f32 conditioning floor).

Mosaic constraints honored (see ops/region_grow_frontier.py for the
trap list): 8-aligned sublane DMA starts (TYB % 8 == 0, halo 8 rows of
which 2 are used), full-lane boxes padded to 128 multiples, values only
statically sliced, non-negative roll shifts, x32 context around the
jitted call.

Reference: the vesselness stage replaces the external SlicerVMTK step
(reference README.md:37-65); per-voxel math identical to
ops/vesselness.py (Frangi 1998 with the standard alpha/beta/c weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vesselness import _x32

PADY = 8          # aligned y halo (2 of 8 rows used)
HZ = 2            # z halo
VMEM_BUDGET = 12 * 2 ** 20


def _sel(cond, x, y):
    """f32-mask select: Mosaic's 3D i1 vectors hit relayout bugs (trap
    list in ops/region_grow_frontier.py), so the comparison is consumed
    immediately into a f32 mask and the select is arithmetic.  Exact
    for finite x/y (m is exactly 0.0 or 1.0)."""
    m = cond.astype(jnp.float32)
    return x * m + y * (1.0 - m)


def _response_from_hessian_masked(hs, alpha, beta, g, bright):
    """ops/vesselness._response_from_hessian with every vector select
    rewritten as f32 mask arithmetic (no i1 vector algebra, no bool
    AND) — the in-kernel form.  All operands are finite by
    construction (p is clamped away from 0, arccos input clipped), so
    the arithmetic select is value-identical to jnp.where."""
    a11, a22, a33, a12, a13, a23 = hs
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = b11 * b11 + b22 * b22 + b33 * b33 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    inv_p = 1.0 / p
    c11, c22, c33 = b11 * inv_p, b22 * inv_p, b33 * inv_p
    c12, c13, c23 = a12 * inv_p, a13 * inv_p, a23 * inv_p
    detb = (c11 * (c22 * c33 - c23 * c23)
            - c12 * (c12 * c33 - c23 * c13)
            + c13 * (c12 * c23 - c22 * c13))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    # cos(arccos(r)/3) WITHOUT trig: Mosaic's TPU lowering implements
    # neither acos nor cos (KernelType.TC), so solve the triple-angle
    # cubic 4c^3 - 3c = r for its largest root c in [1/2, 1] by Newton.
    # Init from the local expansion at the r=-1 double root
    # (c ~= 1/2 + sqrt((1+r)/6)), where plain Newton is only linearly
    # convergent; 4 steps then reach the f32 conditioning floor
    # everywhere (max |dc| ~5e-6 vs f64 trig; the f32 trig path itself
    # sits ~1e-7, so fused-vs-XLA parity is ~1e-5 * ||H|| at worst).
    c = jnp.minimum(
        0.5 + jnp.sqrt(jnp.maximum(1.0 + r, 0.0) * (1.0 / 6.0)), 1.0)
    for _ in range(4):
        f = (4.0 * c * c - 3.0) * c - r
        fp = jnp.maximum(12.0 * c * c - 3.0, 1e-6)
        c = jnp.clip(c - f / fp, 0.5, 1.0)
    # cos(phi + 2pi/3) = -c/2 - (sqrt(3)/2) * sin(phi), sin(phi) >= 0
    # on phi in [0, pi/3]
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    e1 = q + 2.0 * p * c
    e3 = q - p * c - jnp.float32(jnp.sqrt(3.0)) * p * s
    e2 = 3.0 * q - e1 - e3
    m_tiny = (p2 < 1e-24).astype(jnp.float32)
    e1 = q * m_tiny + e1 * (1.0 - m_tiny)
    e2 = q * m_tiny + e2 * (1.0 - m_tiny)
    e3 = q * m_tiny + e3 * (1.0 - m_tiny)

    def swap_if(cond, x, y):
        return _sel(cond, y, x), _sel(cond, x, y)

    a, b, c = e3, e2, e1
    a, b = swap_if(jnp.abs(a) > jnp.abs(b), a, b)
    b, c = swap_if(jnp.abs(b) > jnp.abs(c), b, c)
    a, b = swap_if(jnp.abs(a) > jnp.abs(b), a, b)
    lam1, lam2, lam3 = a, b, c

    eps = 1e-10
    ra = jnp.abs(lam2) / (jnp.abs(lam3) + eps)
    rb = jnp.abs(lam1) / (jnp.sqrt(jnp.abs(lam2 * lam3)) + eps)
    s = jnp.sqrt(lam1 ** 2 + lam2 ** 2 + lam3 ** 2)
    v = ((1.0 - jnp.exp(-(ra ** 2) / (2 * alpha ** 2)))
         * jnp.exp(-(rb ** 2) / (2 * beta ** 2))
         * (1.0 - jnp.exp(-(s ** 2) / (2 * g ** 2 + eps))))
    if bright:
        keep = ((lam2 < 0).astype(jnp.float32)
                * (lam3 < 0).astype(jnp.float32))
    else:
        keep = ((lam2 > 0).astype(jnp.float32)
                * (lam3 > 0).astype(jnp.float32))
    return v * keep


def _shift_z(x, d):
    """x[r+d] with edge duplication (axis 0 is untiled: static slices)."""
    if d == 1:
        return jnp.concatenate([x[1:], x[-1:]], axis=0)
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _nbr(x, axis, d):
    """x[i+d] along a tiled axis via roll (non-negative shifts only);
    wrap-around garbage stays in halo rows/lanes."""
    n = x.shape[axis]
    if axis == 0:
        return _shift_z(x, d)
    return pltpu.roll(x, (n - d) % n, axis)


def _d1(x, axis):
    return _nbr(x, axis, 1) - _nbr(x, axis, -1)


def _d2(x, axis):
    return _nbr(x, axis, 1) + _nbr(x, axis, -1) - 2.0 * x


def _response_kernel(TZ, TYB, Xp, n_ty, sigma, alpha, beta, bright,
                     p_ref, g_ref, out_ref,
                     in_box, out_tile, in_sems, out_sems):
    BZ = TZ + 2 * HZ
    R = TYB + 2 * PADY
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    par = step & 1

    def zy(s):
        it = (s // jnp.int32(n_ty)).astype(jnp.int32)
        iy = (s % jnp.int32(n_ty)).astype(jnp.int32)
        return it * jnp.int32(TZ), iy * jnp.int32(TYB)

    def in_copy(s, p):
        z, y = zy(s)
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(z, BZ), pl.ds(y, R), :],
            in_box.at[p], in_sems.at[p])

    def out_copy(s, p):
        z, y = zy(s)
        return pltpu.make_async_copy(
            out_tile.at[p],
            out_ref.at[pl.ds(z, TZ), pl.ds(y, TYB), :], out_sems.at[p])

    @pl.when(step == 0)
    def _():
        in_copy(0, 0).start()

    # the out buffer this step writes was last used at step-2; its DMA
    # must have drained before the compute below overwrites it
    @pl.when(step >= 2)
    def _():
        out_copy(step - 2, par).wait()

    @pl.when(step + 1 < n_steps)
    def _():
        in_copy(step + 1, 1 - par).start()

    in_copy(step, par).wait()

    sm = in_box[par]
    s2 = jnp.float32(sigma * sigma)
    q = jnp.float32(0.25) * s2
    dz = _d1(sm, 0)
    dx = _d1(sm, 2)
    hs = (_d2(sm, 0) * s2, _d2(sm, 1) * s2, _d2(sm, 2) * s2,
          _d1(dz, 1) * q,   # cross (0,1)
          _d1(dx, 0) * q,   # cross (0,2)
          _d1(dx, 1) * q)   # cross (1,2)
    g = g_ref[0, 0]
    v = _response_from_hessian_masked(hs, alpha, beta, g, bright)
    out_tile[par] = v[HZ:HZ + TZ, PADY:PADY + TYB, :]
    out_copy(step, par).start()

    # drain: the last two steps' out DMAs have no step+2 to wait them
    @pl.when((step == n_steps - 1) & (n_steps >= 2))
    def _():
        out_copy(step - 1, 1 - par).wait()

    @pl.when(step == n_steps - 1)
    def _():
        out_copy(step, par).wait()


def _pick_tile(Xp):
    """Largest (TZ, TYB) whose box intermediates fit the VMEM budget
    (the eigen/response chain keeps ~12 box-size values live at peak,
    plus the double-buffered in/out scratch).  None when even the
    smallest tile exceeds the budget — callers fall back to the XLA
    apply path instead of attempting an over-budget compile."""
    for TZ, TYB in ((8, 24), (8, 16), (8, 8), (4, 8)):
        box = (TZ + 2 * HZ) * (TYB + 2 * PADY) * Xp * 4
        tile = TZ * TYB * Xp * 4
        if 12 * box + 2 * box + 2 * tile <= VMEM_BUDGET:
            return TZ, TYB
    return None


def fused_response_supported(x_extent: int) -> bool:
    """True when some tile fits the scoped-VMEM budget at this lane
    extent (the dispatch guard for ``fused_response``)."""
    Xp = -(-(int(x_extent) + 2 * HZ) // 128) * 128
    return _pick_tile(Xp) is not None


def _pallas_response(P, g, TZ, TYB, Xp, nz, n_ty, sigma, alpha, beta,
                     bright, interpret):
    """(nz*TZ + 4, n_ty*TYB + 16, Xp) padded field -> (nz*TZ,
    n_ty*TYB, Xp) response (trace-time helper; call under jit)."""
    BZ, R = TZ + 2 * HZ, TYB + 2 * PADY
    kernel = functools.partial(_response_kernel, TZ, TYB, Xp, n_ty,
                               sigma, alpha, beta, bright)
    return pl.pallas_call(
        kernel,
        grid=(nz * n_ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nz * TZ, n_ty * TYB, Xp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BZ, R, Xp), jnp.float32),
            pltpu.VMEM((2, TZ, TYB, Xp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(P, jnp.asarray(g, jnp.float32).reshape(1, 1))


def response_range_dynamic(sm, z_lo, zr, sigma, g, alpha=0.5, beta=0.5,
                           bright=True, tile=None, interpret=None):
    """Fused response of ``sm`` rows [z_lo, z_lo + zr) with a TRACED
    ``z_lo`` (one compile serves every chunk of the apply loop).

    Requires rows [z_lo - 2, z_lo + zr + 2) to exist in ``sm`` — true
    for every chunk of the halo-padded volume frame (halo >= 2) — and
    ``zr`` divisible by the z tile.  Call under jit.  ``interpret``
    defaults to interpret-mode off-TPU (parity tests on the CPU mesh)
    and compiled on the device."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Zs, Y, X = sm.shape
    Xp = -(-(X + 2 * HZ) // 128) * 128
    if tile is None:
        tile = _pick_tile(Xp)
        if tile is None:
            raise ValueError(
                f"no fused-response tile fits VMEM at x={X}; guard with "
                "fused_response_supported() and use the XLA apply path")
    TZ, TYB = tile
    if zr % TZ:
        TZ = 4 if zr % 4 == 0 else 1
    nz = zr // TZ
    n_ty = -(-Y // TYB)
    core = jax.lax.dynamic_slice_in_dim(
        sm, jnp.asarray(z_lo, jnp.int32) - HZ, zr + 2 * HZ, axis=0)
    P = jnp.pad(core, ((0, 0), (PADY, n_ty * TYB + PADY - Y),
                       (HZ, Xp - X - HZ)), mode="edge")
    out = _pallas_response(P, g, TZ, TYB, Xp, nz, n_ty, float(sigma),
                           float(alpha), float(beta), bool(bright),
                           bool(interpret))
    return out[:, :Y, HZ:HZ + X]


def frangi_response_fused(sm, sigma, g, alpha=0.5, beta=0.5,
                          bright=True, z_lo=0, z_hi=None, tile=None,
                          interpret=False):
    """Frangi response of ``sm`` rows [z_lo, z_hi) in one fused pass.

    ``sm``: smoothed field (Zs, Y, X) f32 (device).  Rows outside the
    output range serve as real z-halos when available; otherwise (and on
    the y/x faces) the field is edge-replicated, matching the XLA
    stencils' volume-face semantics.  ``g`` may be a traced scalar (the
    gamma from the S-max pass).  Returns (z_hi - z_lo, Y, X) f32.
    """
    Zs, Y, X = sm.shape
    if z_hi is None:
        z_hi = Zs
    Zr = z_hi - z_lo
    Xp = -(-(X + 2 * HZ) // 128) * 128
    if tile is None:
        tile = _pick_tile(Xp)
        if tile is None:
            raise ValueError(
                f"no fused-response tile fits VMEM at x={X}; guard with "
                "fused_response_supported() and use the XLA apply path")
    TZ, TYB = tile
    nz = -(-Zr // TZ)
    n_ty = -(-Y // TYB)

    with _x32():
        out = _fused_jit(sm, jnp.asarray(g, jnp.float32), int(z_lo),
                         int(z_hi), float(sigma), float(alpha),
                         float(beta), bool(bright), int(TZ), int(TYB),
                         int(Xp), int(nz), int(n_ty), bool(interpret))
    return out


@functools.partial(jax.jit, static_argnames=(
    "z_lo", "z_hi", "sigma", "alpha", "beta", "bright", "TZ", "TYB",
    "Xp", "nz", "n_ty", "interpret"))
def _fused_jit(sm, g, z_lo, z_hi, sigma, alpha, beta, bright, TZ, TYB,
               Xp, nz, n_ty, interpret):
    Zs, Y, X = sm.shape
    Zr = z_hi - z_lo

    # halo'd, edge-replicated, alignment-padded field:
    #   P[z, y, x] = sm[clamp(z_lo - HZ + z), clamp(y - PADY), clamp(x - HZ)]
    lo = max(z_lo - HZ, 0)
    hi = min(z_hi + HZ + (nz * TZ - Zr), Zs)
    core = jax.lax.slice_in_dim(sm, lo, hi, axis=0)
    z_front = lo - (z_lo - HZ)
    z_back = (z_lo - HZ + nz * TZ + 2 * HZ) - hi
    pads = ((z_front, z_back),
            (PADY, n_ty * TYB + PADY - Y),
            (HZ, Xp - X - HZ))
    P = jnp.pad(core, pads, mode="edge")
    out = _pallas_response(P, g, TZ, TYB, Xp, nz, n_ty, sigma, alpha,
                           beta, bright, interpret)
    return out[:Zr, :Y, HZ:HZ + X]
