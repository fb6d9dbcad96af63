"""Multiscale Frangi vesselness filter as a TPU kernel.

The reference performs vesselness filtering *outside* the pipeline in 3D
Slicer's VMTK module (README.md:37-65; ~3-5 min and ~10 GB RAM for a
512x512x170 volume on CPU, with advice to manually split larger volumes).
This module brings the step into the framework as a fused XLA program:

  1. gamma-normalized Gaussian-derivative Hessian at each scale
     (separable 1D convolutions; sigma^2-scaled second derivatives);
  2. closed-form eigenvalues of the symmetric 3x3 Hessian per voxel
     (trigonometric method — no per-voxel LAPACK);
  3. Frangi's tubularity measure for bright vessels
     (Ra, Rb, S with the standard alpha/beta/c weights);
  4. max over scales.

Everything is shift/conv/elementwise, so it shards over a volume mesh the
same way the other voxel kernels do.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(sigma: float, order: int, radius: int | None = None):
    if radius is None:
        radius = max(int(np.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    if order == 0:
        k = g
    elif order == 1:
        k = -x / sigma ** 2 * g
    elif order == 2:
        k = (x ** 2 - sigma ** 2) / sigma ** 4 * g
    else:
        raise ValueError(order)
    return np.asarray(k, dtype=np.float32)


def _conv_axis(vol, kernel, axis):
    """Separable 1D convolution along ``axis`` with zero padding.

    Implemented as a banded-matrix contraction so it runs on the MXU:
    a K-tap shifted-add fusion re-reads the volume K times from HBM and
    lane-dim (minor axis) shifts force Mosaic relayouts, while a banded
    matmul reads the volume once and the extra multiplies by the zero
    band are free next to the HBM traffic they replace.  Long axes use
    the block-banded form (see ``_apply_blocked``) so the MXU work
    scales with the bandwidth, not the axis length."""
    n = vol.shape[axis]
    taps = tuple(np.asarray(kernel).tolist())
    B = _banded_conv_matrix(taps, n)
    return _apply_axis_matrix(vol, B, axis, bw=len(kernel) // 2,
                              key=("conv", taps))


@functools.lru_cache(maxsize=None)
def _banded_conv_matrix(taps: tuple, n: int):
    """(n, n) matrix with B[i, j] = taps[j - i + r] (zero padding)."""
    k = np.asarray(taps, np.float32)
    r = len(taps) // 2
    B = np.zeros((n, n), np.float32)
    for t in range(len(taps)):
        d = t - r
        B += np.diag(np.full(n - abs(d), k[t], np.float32), k=d)
    return B


@functools.lru_cache(maxsize=None)
def _diff_matrix(n: int, order: int):
    """Finite-difference matrix with edge replication (x[-1] = x[0],
    x[n] = x[n-1], the shift-with-replicate stencil semantics):

    order=1: out[i] = x[i+1] - x[i-1]   (x[-1]=x[0], x[n]=x[n-1])
    order=2: out[i] = x[i+1] + x[i-1] - 2 x[i]  (same replication)
    """
    B = np.zeros((n, n), np.float32)
    if order == 1:
        B += np.diag(np.ones(n - 1, np.float32), k=1)
        B -= np.diag(np.ones(n - 1, np.float32), k=-1)
        B[0, 0] -= 1.0
        B[n - 1, n - 1] += 1.0
    else:
        B += np.diag(np.ones(n - 1, np.float32), k=1)
        B += np.diag(np.ones(n - 1, np.float32), k=-1)
        B -= 2.0 * np.eye(n, dtype=np.float32)
        B[0, 0] += 1.0
        B[n - 1, n - 1] += 1.0
    return B


_AXIS_EINSUM = ("iz,zyx->iyx", "iy,zyx->zix", "ix,zyx->zyi")

# block-banded contraction geometry: 128-row output blocks, each reading
# a 256-wide input window (the 64-halo covers every Gaussian up to
# sigma ~21, radius ceil(3*sigma); wider bands fall back to dense)
_BLK = 128
_BHALO = 64
_BLOCKED_MIN_N = 384  # below this the dense matmul wastes little


@functools.lru_cache(maxsize=None)
def _block_banded_matrix(key, n: int):
    """(nb, 128, 256) per-block slices of the banded (n, n) matrix named
    by ``key`` (a cache key of `_banded_conv_matrix`/`_diff_matrix`):
    Mb[j, b, c] = B[j*128 + b, j*128 - 64 + c], zero outside [0, n)."""
    kind = key[0]
    B = _diff_matrix(n, key[1]) if kind == "diff" else \
        _banded_conv_matrix(key[1], n)
    nb = -(-n // _BLK)
    Bp = np.zeros((nb * _BLK, nb * _BLK + 2 * _BHALO), np.float32)
    Bp[:n, _BHALO:_BHALO + n] = B
    return np.stack([Bp[j * _BLK:(j + 1) * _BLK,
                        j * _BLK:j * _BLK + _BLK + 2 * _BHALO]
                     for j in range(nb)])


def _apply_blocked(vol, Mb, axis, n):
    """Banded contraction along ``axis`` as a batched block matmul.

    The dense (n, n) form spends n MXU madds per voxel on a band of
    ~2*bw+1 taps — at n ~ 880 that wastes ~46x of the matmul.  Splitting
    the axis into 128-row blocks, each output block only needs the
    256-wide input window around it (bw <= 64), so the per-voxel cost
    drops to 256 madds regardless of n (~3x fewer at Speck's 880,
    ~2x at 512).  Exactly the same linear operator — block windows are
    literal slices of the banded matrix."""
    nb = Mb.shape[0]
    npad = nb * _BLK
    pad = [(0, 0)] * 3
    pad[axis] = (0, npad - n)
    v = jnp.pad(vol, pad) if npad != n else vol
    Mj = jnp.asarray(Mb)
    if axis == 1:
        Z, _, X = v.shape
        vb = v.reshape(Z, nb, _BLK, X)
        zero = jnp.zeros((Z, 1, _BHALO, X), v.dtype)
        left = jnp.concatenate([zero, vb[:, :-1, _BLK - _BHALO:, :]],
                               axis=1)
        right = jnp.concatenate([vb[:, 1:, :_BHALO, :], zero], axis=1)
        w = jnp.concatenate([left, vb, right], axis=2)
        out = jnp.einsum("jbc,zjcx->zjbx", Mj, w,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        out = out.reshape(Z, npad, X)
    else:
        Z, Y, _ = v.shape
        vb = v.reshape(Z, Y, nb, _BLK)
        zero = jnp.zeros((Z, Y, 1, _BHALO), v.dtype)
        left = jnp.concatenate([zero, vb[:, :, :-1, _BLK - _BHALO:]],
                               axis=2)
        right = jnp.concatenate([vb[:, :, 1:, :_BHALO], zero], axis=2)
        w = jnp.concatenate([left, vb, right], axis=3)
        out = jnp.einsum("jbc,zyjc->zyjb", Mj, w,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        out = out.reshape(Z, Y, npad)
    return jax.lax.slice_in_dim(out, 0, n, axis=axis)


def _apply_axis_matrix(vol, B, axis, bw=None, key=None):
    # HIGHEST: full-f32 MXU passes — the default (one bf16 pass) loses
    # enough mantissa to visibly corrupt the Hessian eigen-structure and
    # fragment the downstream segmentation
    n = vol.shape[axis]
    if (key is not None and bw is not None and bw <= _BHALO
            and axis >= 1 and n >= _BLOCKED_MIN_N):
        return _apply_blocked(vol, _block_banded_matrix(key, n), axis, n)
    return jnp.einsum(_AXIS_EINSUM[axis], B, vol,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def _smooth(vol, sigma: float):
    """Gaussian smoothing, three separable banded-matmul passes."""
    g0 = _gaussian_kernel(sigma, 0)
    sm = vol
    for axis in range(3):
        sm = _conv_axis(sm, g0, axis)
    return sm


def _d_shift(x, axis, order):
    """Edge-replicated central difference via shifted slices — the
    same stencil `_diff_matrix` encodes, without an (n, n) dense
    contraction.  Used on the z/y axes (sublane/major: shifts are
    layout-free there); the minor (lane) axis stays on the MXU, where
    shifts would force Mosaic relayouts."""
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    hi = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    xm = jnp.concatenate(
        [lo, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    xp = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis), hi], axis=axis)
    return xp - xm if order == 1 else xp + xm - 2.0 * x


def _hessian_from_smoothed(sm, sigma: float):
    """gamma=1 normalized Hessian components from the smoothed field.

    The 3-tap difference stencils run as shifted slices on the z/y
    axes and as banded contractions only on the minor (x) axis; the
    cross terms with an x-derivative reuse one shared ``dx`` pass, so
    each Hessian costs 2 MXU passes + 7 shift passes (was 8 MXU
    passes — the dense (n, n) contraction of a 3-tap stencil wastes
    n/3 of the MXU work at n ~ 880)."""
    s2 = jnp.float32(sigma * sigma)

    def d1(x, axis):
        if axis < 2:
            return _d_shift(x, axis, 1)
        return _apply_axis_matrix(x, _diff_matrix(x.shape[axis], 1), axis,
                                  bw=1, key=("diff", 1))

    def d2(axis):
        if axis < 2:
            out = _d_shift(sm, axis, 2)
        else:
            out = _apply_axis_matrix(sm, _diff_matrix(sm.shape[axis], 2),
                                     axis, bw=1, key=("diff", 2))
        return out * s2

    dz, dy, dx = d1(sm, 0), d1(sm, 1), d1(sm, 2)
    q = 0.25 * s2
    return (d2(0), d2(1), d2(2),
            d1(dz, 1) * q,   # xy  (axes 0,1)
            d1(dx, 0) * q,   # xz  (axes 0,2: D1z D1x sm == D1x D1z sm)
            d1(dx, 1) * q)   # yz  (axes 1,2)


def hessian_at_scale(vol, sigma: float):
    """gamma=1 normalized Hessian (xx, yy, zz, xy, xz, yz).

    Smooth once with the Gaussian (3 separable passes), then central
    finite differences for the second derivatives — G''*I = D2(G*I), so
    this is the derivative-of-smoothed formulation (what skimage's Frangi
    uses) at ~5x fewer full-volume passes than separate derivative
    kernels per component.  All passes are banded-matrix contractions on
    the MXU (edge replication encoded in the difference-matrix border
    rows); the cross terms reuse the three first-derivative fields."""
    return _hessian_from_smoothed(_smooth(vol, float(sigma)), float(sigma))


def symmetric_eigvals_3x3(a11, a22, a33, a12, a13, a23):
    """Eigenvalues of symmetric 3x3 matrices, ascending, elementwise
    (trigonometric closed form; numerically safe for near-degenerate
    spectra)."""
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = b11 * b11 + b22 * b22 + b33 * b33 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    inv_p = 1.0 / p
    c11, c22, c33 = b11 * inv_p, b22 * inv_p, b33 * inv_p
    c12, c13, c23 = a12 * inv_p, a13 * inv_p, a23 * inv_p
    # det(B/p) / 2
    detb = (c11 * (c22 * c33 - c23 * c23)
            - c12 * (c12 * c33 - c23 * c13)
            + c13 * (c12 * c23 - c22 * c13))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    # degenerate (p ~ 0): all eigenvalues = q
    tiny = p2 < 1e-24
    e1 = jnp.where(tiny, q, e1)
    e2 = jnp.where(tiny, q, e2)
    e3 = jnp.where(tiny, q, e3)
    return e3, e2, e1  # ascending


def _scale_response(vol, sigma, alpha, beta, g, bright):
    """Single-scale Frangi response given the scale weight ``g``."""
    return _response_from_hessian(hessian_at_scale(vol, float(sigma)),
                                  alpha, beta, g, bright)


def _response_from_hessian(hs, alpha, beta, g, bright):
    hxx, hyy, hzz, hxy, hxz, hyz = hs
    l1a, l2a, l3a = symmetric_eigvals_3x3(hxx, hyy, hzz, hxy, hxz, hyz)
    a, b, c = l1a, l2a, l3a

    def swap_if(cond, x, y):
        return jnp.where(cond, y, x), jnp.where(cond, x, y)

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
        v = jnp.where((lam2 < 0) & (lam3 < 0), v, 0.0)
    else:
        v = jnp.where((lam2 > 0) & (lam3 > 0), v, 0.0)
    return v


def _apply_workers(fused_response, x_extent: int):
    """(apply_sm, apply, jit-call context) for the response loops: the
    fused Pallas workers when requested AND a tile fits the VMEM budget
    at this lane extent, the XLA workers otherwise.  ``"auto"`` (the
    config default) means fused on a real TPU only — off-device the
    kernel would run in interpret mode, slower than XLA for no benefit.
    The fused workers need the x32 context around the jitted CALL
    (Mosaic re-traces reductions under the global x64 flag)."""
    if fused_response == "auto":
        fused_response = jax.default_backend() == "tpu"
    if fused_response:
        from .vesselness_fused import fused_response_supported
        if fused_response_supported(x_extent):
            return _apply_chunk_sm_fused, _apply_chunk_fused, _x32
    return _apply_chunk_sm, _apply_chunk, contextlib.nullcontext


def frangi_vesselness_chunked(volume, sigmas=(1.0, 2.0, 3.0),
                              alpha=0.5, beta=0.5, gamma=None,
                              bright=True, chunk_z: int = 96,
                              donate_input: bool = False,
                              fused_response="auto"):
    """Multiscale Frangi for volumes whose full-grid temporaries exceed
    HBM (~8 f32 fields per scale; a 880x880x640 Speck volume OOMs one
    v5e chip).  The volume is processed in halo'd z slabs; when
    ``gamma`` is None the default per-scale weight ``0.5 * max(S)`` is
    computed EXACTLY with a first chunked pass (2x Hessian compute).

    Matches the unchunked kernel on all interior z-rows to f32
    matmul-blocking rounding (~1e-5: slab and full volume contract
    different-sized banded matrices); the two volume-face rows differ
    slightly more (the unchunked finite differences edge-replicate the
    smoothed field at the volume border, a slab sees the zero-padded
    tail instead — max observed deviation ~0.013 on the outermost row).
    """
    vol = volume if isinstance(volume, jax.Array) else \
        jnp.asarray(np.asarray(volume, np.float32))
    vol = vol.astype(jnp.float32)
    Z = vol.shape[0]
    shape_yx = vol.shape[1:]
    halo = int(np.ceil(3.0 * max(sigmas))) + 1
    n_chunks = -(-Z // chunk_z)
    Zp = n_chunks * chunk_z
    volp = jnp.pad(vol, ((halo, Zp - Z + halo), (0, 0), (0, 0)))
    if donate_input and isinstance(volume, jax.Array):
        # Speck-scale HBM budget: volp + smoothed cache + best is ~8 GB
        # of the 16 GB chip; keeping the 2 GB input alive on top tips
        # the allocator into host spilling (measured: the in-pipeline
        # stage thrashed at ~150x the standalone time).  The caller
        # opts in to having its array freed once the padded copy exists.
        # (block_until_ready returns at ENQUEUE on this backend — a
        # device->host read is the only real barrier)
        jax.device_get(volp[0, 0, 0])
        volume.delete()
    del vol

    starts = [c * chunk_z for c in range(n_chunks)]
    best = jnp.zeros((Zp,) + shape_yx, jnp.float32)
    # fused (Pallas) apply workers need the x32 context around the
    # jitted CALL (Mosaic re-traces reductions under the global x64
    # flag); the XLA workers keep their usual context
    ap_sm, ap, ctx = _apply_workers(fused_response, shape_yx[-1])
    for sigma in sigmas:
        if gamma is None:
            # gamma pass caches the smoothed field per interior chunk so
            # the response pass skips re-smoothing (the 3 banded-matmul
            # passes are the bulk of a scale evaluation), and takes the
            # Frobenius max straight from the Hessian (no eigen pass)
            smf = jnp.zeros_like(volp)
            parts = []
            for s in starts:
                smf, smax_c = _smax_chunk_cache(smf, volp, s, float(sigma),
                                                halo, chunk_z)
                parts.append(smax_c)
            g = jnp.max(jnp.stack(parts)) * 0.5
            with ctx():
                for s in starts:
                    best = ap_sm(best, smf, s, g, float(sigma),
                                 float(alpha), float(beta),
                                 bool(bright), halo, chunk_z)
            del smf
        else:
            g = jnp.float32(gamma)
            with ctx():
                for s in starts:
                    best = ap(best, volp, s, g, float(sigma),
                              float(alpha), float(beta),
                              bool(bright), halo, chunk_z)
    return best[:Z]


# module-level jitted chunk workers: a per-call closure would create a
# fresh jit cache every invocation and RECOMPILE every program through
# the (slow, remote) compiler — warm Speck-scale runs went from ~80 s to
# ~2 s when these were hoisted
@functools.partial(jax.jit, static_argnames=("sigma", "halo", "chunk_z"),
                   donate_argnums=(0,))
def _smax_chunk_cache(smf, volp, start, sigma, halo, chunk_z):
    """Frobenius S-max of one chunk + write its interior smoothed rows
    into the full-frame cache ``smf`` (consumed by ``_apply_chunk_sm``).
    """
    sl = jax.lax.dynamic_slice_in_dim(volp, start, chunk_z + 2 * halo,
                                      axis=0)
    sm = _smooth(sl, sigma)
    hxx, hyy, hzz, hxy, hxz, hyz = _hessian_from_smoothed(sm, sigma)
    s2 = (hxx * hxx + hyy * hyy + hzz * hzz
          + 2.0 * (hxy * hxy + hxz * hxz + hyz * hyz))
    s2 = jax.lax.slice_in_dim(s2, halo, halo + chunk_z, axis=0)
    smf = jax.lax.dynamic_update_slice_in_dim(
        smf, jax.lax.slice_in_dim(sm, halo, halo + chunk_z, axis=0),
        start + halo, axis=0)
    return smf, jnp.sqrt(jnp.max(s2))


@functools.partial(jax.jit, static_argnames=("sigma", "halo", "chunk_z"))
def _smax_chunk(volp, start, sigma, halo, chunk_z):
    """Frobenius S-max of one chunk without caching the smoothed field —
    the gamma pass the streamed path hides under the upload wire for the
    scales whose smoothed-field cache would not fit HBM at Speck scale
    (volp + per-scale caches + best exceeds the allocator budget)."""
    sl = jax.lax.dynamic_slice_in_dim(volp, start, chunk_z + 2 * halo,
                                      axis=0)
    sm = _smooth(sl, sigma)
    hxx, hyy, hzz, hxy, hxz, hyz = _hessian_from_smoothed(sm, sigma)
    s2 = (hxx * hxx + hyy * hyy + hzz * hzz
          + 2.0 * (hxy * hxy + hxz * hxz + hyz * hyz))
    s2 = jax.lax.slice_in_dim(s2, halo, halo + chunk_z, axis=0)
    return jnp.sqrt(jnp.max(s2))


@functools.partial(jax.jit,
                   static_argnames=("sigma", "alpha", "beta", "bright",
                                    "halo", "chunk_z"),
                   donate_argnums=(0,))
def _apply_chunk_sm(best, smf, start, g, sigma, alpha, beta, bright,
                    halo, chunk_z):
    """Frangi response of one chunk from the cached smoothed field.

    Interior rows are >= halo >= 2 away from the slab edges, so the
    edge-replicate difference matrices never touch them; the slab's halo
    rows come from neighboring chunks' exact interiors.  At the volume
    faces the halo rows of the cached smoothed field are exact zeros,
    whereas the direct chunked path (_apply_chunk / explicit gamma)
    smooths the zero padding into a nonzero tail — the two chunked paths
    therefore differ slightly on the outermost z rows (within the
    documented ~0.013 face-row tolerance; interior parity unaffected)."""
    sm = jax.lax.dynamic_slice_in_dim(smf, start, chunk_z + 2 * halo,
                                      axis=0)
    hs = _hessian_from_smoothed(sm, sigma)
    v = _response_from_hessian(hs, alpha, beta, g, bright)
    v = jax.lax.slice_in_dim(v, halo, halo + chunk_z, axis=0)
    cur = jax.lax.dynamic_slice_in_dim(best, start, chunk_z, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(
        best, jnp.maximum(cur, v), start, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "alpha", "beta", "bright",
                                    "halo", "chunk_z"),
                   donate_argnums=(0,))
def _apply_chunk(best, volp, start, g, sigma, alpha, beta, bright,
                 halo, chunk_z):
    sl = jax.lax.dynamic_slice_in_dim(volp, start, chunk_z + 2 * halo,
                                      axis=0)
    v = _scale_response(sl, sigma, alpha, beta, g, bright)
    v = jax.lax.slice_in_dim(v, halo, halo + chunk_z, axis=0)
    cur = jax.lax.dynamic_slice_in_dim(best, start, chunk_z, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(
        best, jnp.maximum(cur, v), start, axis=0)


_x32 = functools.partial(jax.enable_x64, False)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "alpha", "beta", "bright",
                                    "halo", "chunk_z"),
                   donate_argnums=(0,))
def _apply_chunk_sm_fused(best, smf, start, g, sigma, alpha, beta,
                          bright, halo, chunk_z):
    """Fused-kernel counterpart of ``_apply_chunk_sm`` (opt-in,
    ops/vesselness_fused.py): the chunk's response comes straight from
    the cached smoothed field in ONE Pallas pass instead of ~12 XLA
    slab passes.  ``start`` stays dynamic — one compile per config."""
    from .vesselness_fused import response_range_dynamic
    v = response_range_dynamic(smf, start + halo, chunk_z, sigma, g,
                               alpha, beta, bright)
    cur = jax.lax.dynamic_slice_in_dim(best, start, chunk_z, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(
        best, jnp.maximum(cur, v), start, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "alpha", "beta", "bright",
                                    "halo", "chunk_z"),
                   donate_argnums=(0,))
def _apply_chunk_fused(best, volp, start, g, sigma, alpha, beta, bright,
                       halo, chunk_z):
    """Fused-kernel counterpart of ``_apply_chunk``: XLA blocked-matmul
    smoothing of the slab, then the fused response pass."""
    from .vesselness_fused import response_range_dynamic
    sl = jax.lax.dynamic_slice_in_dim(volp, start, chunk_z + 2 * halo,
                                      axis=0)
    sm = _smooth(sl, sigma)
    v = response_range_dynamic(sm, halo, chunk_z, sigma, g, alpha,
                               beta, bright)
    cur = jax.lax.dynamic_slice_in_dim(best, start, chunk_z, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(
        best, jnp.maximum(cur, v), start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_slab_u8(volp, slab_u8, start, scale, offset):
    """Dequantize one uint8 slab and write it into the padded volume."""
    sl = slab_u8.astype(jnp.float32) * scale + offset
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("rows", "yx"))
def _upload_slab_u12(volp, packed, start, scale, offset, rows, yx):
    """Unpack one 12-bit-packed slab (3 bytes / 2 voxels) into volp."""
    b0 = packed[:, 0].astype(jnp.int32)
    b1 = packed[:, 1].astype(jnp.int32)
    b2 = packed[:, 2].astype(jnp.int32)
    v0 = (b0 << 4) | (b1 >> 4)
    v1 = ((b1 & 0xF) << 8) | b2
    n = rows * int(np.prod(yx))
    vals = jnp.stack([v0, v1], axis=1).reshape(-1)[:n]
    sl = (vals.astype(jnp.float32) * scale + offset).reshape((rows,) + yx)
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_slab_bq4(volp, packed, row_scale, row_min, start):
    """Unpack one row-adaptive 4-bit slab into volp.

    ``packed``: uint8 (rows, ny, nx//2), two voxels per byte (high nibble
    first).  ``row_scale``/``row_min``: f32 (rows, ny) per-(z,y)-row
    dequantization — 8 bytes per ``nx`` voxels of sideband (<1% wire
    overhead) buys block-adaptive precision: a row's quantization step is
    its own range/15, so flat background rows are near-exact and the step
    stays below image noise even through vessels."""
    hi = (packed >> 4).astype(jnp.float32)
    lo = (packed & 0xF).astype(jnp.float32)
    q = jnp.stack([hi, lo], axis=-1).reshape(packed.shape[:2] + (-1,))
    sl = q * row_scale[..., None] + row_min[..., None]
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_slab_bq3(volp, packed, row_scale, row_min, start):
    """Unpack one row-adaptive 3-bit slab (8 voxels per 3 bytes,
    MSB-first 24-bit words) into volp."""
    b = packed.reshape(packed.shape[:2] + (-1, 3)).astype(jnp.int32)
    w = (b[..., 0] << 16) | (b[..., 1] << 8) | b[..., 2]
    vs = [((w >> (21 - 3 * k)) & 7).astype(jnp.float32) for k in range(8)]
    q = jnp.stack(vs, axis=-1).reshape(packed.shape[:2] + (-1,))
    sl = q * row_scale[..., None] + row_min[..., None]
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_slab_bq2(volp, packed, row_scale, row_min, start):
    """Unpack one row-adaptive 2-bit slab (4 voxels per byte,
    MSB-first) into volp."""
    vs = [((packed >> s) & 3).astype(jnp.float32) for s in (6, 4, 2, 0)]
    q = jnp.stack(vs, axis=-1).reshape(packed.shape[:2] + (-1,))
    sl = q * row_scale[..., None] + row_min[..., None]
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_slab_f16(volp, slab_f16, start):
    return jax.lax.dynamic_update_slice_in_dim(
        volp, slab_f16.astype(jnp.float32), start, axis=0)


def _bq_dequant_packed(packed_i32, row_scale, row_min, bits):
    """int32 bq-packed (rows, ny, nxp) -> dequantized f32 (rows, ny, nx).

    Shared by the dense and sparse upload paths; the bit math mirrors
    ``_upload_slab_bq{4,3,2}`` exactly."""
    if bits == 4:
        hi = (packed_i32 >> 4).astype(jnp.float32)
        lo = (packed_i32 & 0xF).astype(jnp.float32)
        q = jnp.stack([hi, lo], axis=-1).reshape(
            packed_i32.shape[:2] + (-1,))
    elif bits == 3:
        b = packed_i32.reshape(packed_i32.shape[:2] + (-1, 3))
        w = (b[..., 0] << 16) | (b[..., 1] << 8) | b[..., 2]
        vs = [((w >> (21 - 3 * k)) & 7).astype(jnp.float32)
              for k in range(8)]
        q = jnp.stack(vs, axis=-1).reshape(packed_i32.shape[:2] + (-1,))
    else:  # 2-bit
        vs = [((packed_i32 >> s) & 3).astype(jnp.float32)
              for s in (6, 4, 2, 0)]
        q = jnp.stack(vs, axis=-1).reshape(packed_i32.shape[:2] + (-1,))
    return q * row_scale[..., None] + row_min[..., None]


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("bits", "cs", "n_chunks", "rows", "ny"))
def _upload_slab_bq_sparse(volp, payload, chunk_idx, row_scale, row_min,
                           start, *, bits, cs, n_chunks, rows, ny):
    """Occupancy-skipped row-adaptive upload: only row-chunks whose range
    clears the background threshold ship payload bytes over the wire; the
    rest dequantize to their row midpoint via a zeroed scale sideband.

    ``payload``: uint8 (bucket, cs*nxp) — the KEPT chunks of ``cs``
    consecutive (z,y) rows, compacted on the host, padded to a power-of-two
    bucket (pad slots carry ``chunk_idx == n_chunks``, which matches
    nothing).  Reconstruction of the dense packed array is a one-hot
    matmul — the MXU-native scatter this backend demands (per-element
    scatter runs at ~8 us/element here) — followed by the shared bq bit
    unpack.  Bytes are exact in f32 one-hot contractions, so kept chunks
    decode bit-identically to the dense path."""
    onehot = (jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
              == chunk_idx[None, :]).astype(jnp.float32)
    # DEFAULT (single-pass bf16) is exact here: bytes <= 255 and 0/1
    # one-hots are bf16-representable integers, each output sums exactly
    # one exact product into an f32 accumulator
    dense = jax.lax.dot(onehot, payload.astype(jnp.float32),
                        precision=jax.lax.Precision.DEFAULT)
    nxp = payload.shape[1] // cs
    q8 = jnp.round(dense).astype(jnp.int32).reshape(
        n_chunks * cs, nxp)[: rows * ny]
    sl = _bq_dequant_packed(q8.reshape(rows, ny, nxp), row_scale, row_min,
                            bits)
    return jax.lax.dynamic_update_slice_in_dim(volp, sl, start, axis=0)


def _sparse_bucket(n: int) -> int:
    """Pad count -> {2^k, 1.5*2^k} sizes: <=1.33x padding with only
    O(log) distinct compiled shapes (remote compiles cost 20-120 s)."""
    b = 64
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


# background-row skip: a (z,y) row whose range is below this fraction of
# the slab's intensity range carries no vessel (vessel contrast >> noise
# range on MRA-like data); measured bimodal on the bench phantoms
# (background rows ~0.15, vessel rows >0.75 of range — any threshold in
# 0.25-0.4 selects the same rows)
_SKIP_BG_FRACTION = 0.25
_SKIP_CHUNK_ROWS = 8


def _skip_threshold(rmn, rng):
    """Keep/skip threshold from a ROBUST slab range.

    The slab top is the 99.5th percentile of row maxima, not the max:
    an isolated hyperintense artifact row (motion/metal/skull flash,
    rare by definition) must not inflate the range and reclassify real
    vessel rows as background.  Vessel rows are 8-17% of rows at MRA
    occupancies, far above the 0.5% clip, so their maxima still set the
    top; if vessels ever occupy <0.5% of rows the threshold collapses
    toward the noise range and the >50%-kept dense fallback engages —
    failing safe (no wire saving) rather than losing vessels."""
    smax = float(np.percentile(rmn + rng, 99.5))
    smin = float(rmn.min())
    return _SKIP_BG_FRACTION * (smax - smin)


def _pack_compact_native(slf, bits):
    """Stats-then-pack-selected host path for the occupancy-skipped
    upload: one native row min/max scan decides keep/skip, then only the
    kept chunks' rows are quantized+packed (bqn_pack_rows_f32) — the
    background 80-90% of the slab never pays the pack.  Returns the same
    tuple as ``_compact_bq_slab`` or ``None`` (caller falls back to the
    full pack).  Kept payload and sideband are bit-identical to the
    full-pack path (same native row scan and rounding)."""
    from .native import bq_pack_rows_native, bq_row_stats_native

    rows, ny, nx = slf.shape
    R = rows * ny
    cs = _SKIP_CHUNK_ROWS
    if R % cs:
        return None
    rmn, rmx = bq_row_stats_native(slf)
    qmax = float((1 << bits) - 1)
    # derive the range through the quantized scale (rng -> rsc -> rng)
    # so thresholds and midpoints match ``_compact_bq_slab`` (which only
    # sees the pack's rsc sideband) bit for bit
    rsc_all = ((rmx - rmn) / qmax).astype(np.float32)
    rng = rsc_all * qmax
    thr = _skip_threshold(rmn, rng)
    if thr <= 0:
        return None
    nch = R // cs
    keep_chunk = (rng > thr).reshape(nch, cs).any(axis=1)
    if keep_chunk.mean() > 0.5:
        return None
    idx = np.nonzero(keep_chunk)[0].astype(np.int32)
    rowlist = (idx[:, None].astype(np.int64) * cs
               + np.arange(cs, dtype=np.int64)[None, :]).reshape(-1)
    rb = nx * bits // 8
    pay = bq_pack_rows_native(slf, rowlist, bits).reshape(len(idx),
                                                          cs * rb)
    bucket = _sparse_bucket(len(idx))
    pad = bucket - len(idx)
    if pad:
        idx = np.concatenate([idx, np.full(pad, nch, np.int32)])
        pay = np.pad(pay, ((0, pad), (0, 0)))
    keep_eff = np.repeat(keep_chunk, cs).reshape(rows, ny)
    rmn2 = np.where(keep_eff, rmn, rmn + 0.5 * rng).astype(np.float32)
    rsc2 = np.where(keep_eff, rsc_all, 0.0).astype(np.float32)
    return pay, idx, rsc2, rmn2, nch


def _compact_bq_slab(packed, rsc, rmn, bits):
    """Host-side compaction for the occupancy-skipped upload.

    Returns ``None`` when skipping would not pay (kept fraction > 50%),
    else ``(payload, chunk_idx, rsc2, rmn2, n_chunks)`` ready for
    ``_upload_slab_bq_sparse``.  Rows inside kept chunks keep their real
    sideband (they decode bit-exactly); rows in skipped chunks get
    scale 0 / min = midpoint."""
    qmax = float((1 << bits) - 1)
    rng = rsc * qmax
    thr = _skip_threshold(rmn, rng)
    if thr <= 0:
        return None
    rows, ny, nxp = packed.shape
    R = rows * ny
    cs = _SKIP_CHUNK_ROWS
    nch = -(-R // cs)
    keep_rows = (rng > thr).reshape(-1)
    keep_chunk = np.pad(keep_rows, (0, nch * cs - R)).reshape(
        nch, cs).any(axis=1)
    if keep_chunk.mean() > 0.5:
        return None
    idx = np.nonzero(keep_chunk)[0].astype(np.int32)
    flat = packed.reshape(R, nxp)
    if nch * cs != R:
        flat = np.pad(flat, ((0, nch * cs - R), (0, 0)))
    pay = flat.reshape(nch, cs * nxp)[idx]
    bucket = _sparse_bucket(len(idx))
    pad = bucket - len(idx)
    if pad:
        idx = np.concatenate([idx, np.full(pad, nch, np.int32)])
        pay = np.pad(pay, ((0, pad), (0, 0)))
    keep_eff = np.repeat(keep_chunk, cs)[:R].reshape(rows, ny)
    rmn2 = np.where(keep_eff, rmn, rmn + 0.5 * rng).astype(np.float32)
    rsc2 = np.where(keep_eff, rsc, 0.0).astype(np.float32)
    return pay, idx, rsc2, rmn2, nch


def frangi_vesselness_streamed(raw, sigmas=(1.0, 2.0, 3.0),
                               alpha=0.5, beta=0.5, gamma=None,
                               bright=True, chunk_z: int = 48,
                               bits: int = 8,
                               fused_response="auto",
                               skip_background: bool = False):
    """Multiscale Frangi from a HOST volume with the upload streamed
    slab-by-slab, overlapped with the first scale's gamma pass.

    On a tunneled TPU the wire is the pipeline bottleneck (upload ~40
    MB/s); uploading the whole quantized volume before computing
    serializes wire and MXU.  Here slab ``c+1``'s transfer is enqueued
    before chunk ``c``'s Hessian pass, so the runtime moves bytes while
    the MXU works, and the raw volume only ever exists on device in its
    padded chunked form (no full-volume staging copy — at Speck scale
    this also removes the donate-and-delete dance the chunked device
    path needs).  Every scale's gamma (S-max) pass ALSO runs inside the
    upload loop, hidden under the wire; scale 0 applies from its cached
    smoothed field (bit-identical to ``frangi_vesselness_chunked``
    interiors), later scales apply directly from the resident volume —
    identical on all rows >= halo from the z faces, within the
    documented ~0.013 face-row envelope on the rest (the pipeline's
    border margin suppresses exactly those rows).

    ``bits``: wire format — 4 (row-adaptive nibble) / 8 / 12 (packed
    fixed point) or 16 (f16).
    Returns ``(vesselness, upload_phase_s, compute_phase_s)``; the first
    phase is the interleaved upload+first-scale pass (wire-bound), the
    second is the remaining pure-compute passes, both synced via a
    device->host read (block_until_ready returns at enqueue time on the
    tunneled backend).
    """
    import time as _time

    raw = np.asarray(raw)
    Z = raw.shape[0]
    shape_yx = raw.shape[1:]
    yx = int(np.prod(shape_yx))
    sigmas = tuple(float(s) for s in sigmas)
    halo = int(np.ceil(3.0 * max(sigmas))) + 1
    chunk_z = max(chunk_z, halo)  # very large sigmas grow the slab
    n_chunks = -(-Z // chunk_z)
    Zp = n_chunks * chunk_z

    # sub-byte packing needs an aligned x extent; degrade to the next
    # finer format that fits instead of silently jumping to u8
    # (e.g. x=170: bq2 needs %4 -> falls to bq4 at %2, not 8-bit)
    while bits in (2, 3, 4) and raw.shape[2] % {4: 2, 3: 8, 2: 4}[bits]:
        bits = {2: 3, 3: 4, 4: 8}[bits]
    if bits in (8, 12):
        # only the global fixed-point formats need the volume range;
        # the row-adaptive and f16 paths must not pay two full-volume
        # host scans (seconds at Speck scale on this 1-core VM)
        mn = float(raw.min())
        scale = (float(raw.max()) - mn) or 1.0
    else:
        mn, scale = 0.0, 1.0

    t0 = _time.perf_counter()
    volp = jnp.zeros((Zp + 2 * halo,) + shape_yx, jnp.float32)

    def upload(volp, c):
        lo = c * chunk_z
        hi = min(Z, lo + chunk_z)
        rows = hi - lo
        sl = raw[lo:hi]
        if bits in (2, 3, 4):
            # row-adaptive low-bit: per-(z,y)-row min/scale sideband.
            # Native single-pass pack when the C library is available
            # (row min/max scan + L1-resident quantize ~4x the numpy
            # passes on this 1-core VM), bit-exact numpy fallback else.
            slf = sl if sl.dtype == np.float32 \
                else sl.astype(np.float32)
            if skip_background:
                # fast path: native stats scan + pack of kept rows only
                # (background rows never pay the quantize+pack)
                try:
                    sp = _pack_compact_native(
                        np.ascontiguousarray(slf), bits)
                except Exception:  # no toolchain: compact post-pack below
                    sp = None
                if sp is not None:
                    pay, idx, rsc2, rmn2, nch = sp
                    return _upload_slab_bq_sparse(
                        volp, jnp.asarray(pay), jnp.asarray(idx),
                        jnp.asarray(rsc2), jnp.asarray(rmn2), lo + halo,
                        bits=bits, cs=_SKIP_CHUNK_ROWS, n_chunks=nch,
                        rows=rows, ny=int(shape_yx[0]))
            try:
                from .native import bq_pack_native
                packed, rsc, rmn = bq_pack_native(
                    np.ascontiguousarray(slf), bits)
            except Exception:  # no toolchain: numpy passes
                qmax = (1 << bits) - 1
                rmn = slf.min(axis=2)
                rng = slf.max(axis=2) - rmn
                inv = np.where(rng > 0,
                               float(qmax) / np.maximum(rng, 1e-30),
                               0.0)
                q = np.round((slf - rmn[..., None])
                             * inv[..., None]).astype(np.uint32)
                if bits == 4:
                    packed = ((q[..., 0::2] << 4)
                              | q[..., 1::2]).astype(np.uint8)
                elif bits == 2:
                    packed = ((q[..., 0::4] << 6) | (q[..., 1::4] << 4)
                              | (q[..., 2::4] << 2)
                              | q[..., 3::4]).astype(np.uint8)
                else:  # 3-bit: 8 voxels -> one 24-bit MSB-first word
                    g = q.reshape(q.shape[:2] + (-1, 8))
                    w = np.zeros(g.shape[:3], np.uint32)
                    for k in range(8):
                        w |= g[..., k] << (21 - 3 * k)
                    packed = np.stack([(w >> 16) & 0xFF, (w >> 8) & 0xFF,
                                       w & 0xFF], axis=-1) \
                        .astype(np.uint8).reshape(q.shape[:2] + (-1,))
                rsc = rng / float(qmax)
            if skip_background:
                # occupancy skip: background row-chunks ship no payload
                # (wire is the stage bottleneck; 80-90% of MRA-like rows
                # carry only noise).  Kept chunks decode bit-exactly;
                # skipped rows flatten to their midpoint.  Falls through
                # to the dense path when it would not pay.
                sp = _compact_bq_slab(packed, rsc, rmn, bits)
                if sp is not None:
                    pay, idx, rsc2, rmn2, nch = sp
                    return _upload_slab_bq_sparse(
                        volp, jnp.asarray(pay), jnp.asarray(idx),
                        jnp.asarray(rsc2), jnp.asarray(rmn2), lo + halo,
                        bits=bits, cs=_SKIP_CHUNK_ROWS, n_chunks=nch,
                        rows=rows, ny=int(shape_yx[0]))
            up = {4: _upload_slab_bq4, 3: _upload_slab_bq3,
                  2: _upload_slab_bq2}[bits]
            return up(volp, jnp.asarray(packed), jnp.asarray(rsc),
                      jnp.asarray(rmn), lo + halo)
        if bits == 8:
            q = np.round((sl.astype(np.float32) - mn)
                         * (255.0 / scale)).astype(np.uint8)
            return _upload_slab_u8(volp, jnp.asarray(q), lo + halo,
                                   scale / 255.0, mn)
        if bits == 12:
            flat = sl.reshape(-1).astype(np.float32)
            pad = (-flat.shape[0]) % 2
            if pad:
                flat = np.concatenate([flat, flat[-1:]])
            q = np.round((flat - mn) * (4095.0 / scale)).astype(np.uint16)
            q0, q1 = q[0::2], q[1::2]
            packed = np.empty((q0.shape[0], 3), np.uint8)
            packed[:, 0] = q0 >> 4
            packed[:, 1] = ((q0 & 0xF) << 4) | (q1 >> 8)
            packed[:, 2] = q1 & 0xFF
            return _upload_slab_u12(volp, jnp.asarray(packed), lo + halo,
                                    jnp.float32(scale / 4095.0),
                                    jnp.float32(mn), rows, shape_yx)
        return _upload_slab_f16(volp, jnp.asarray(sl.astype(np.float16)),
                                lo + halo)

    starts = [c * chunk_z for c in range(n_chunks)]
    sigma0 = sigmas[0]
    best = jnp.zeros((Zp,) + shape_yx, jnp.float32)
    ap_sm, ap, ctx = _apply_workers(fused_response, shape_yx[-1])

    # phase 1 (wire-bound): slab uploads interleaved with the first
    # scale's smoothed-field/S-max chunks.  Chunk c reads padded rows
    # [c*cz, (c+1)*cz + 2*halo) = raw rows up to (c+1)*cz + halo, so it
    # needs slab c+1 uploaded (chunk_z >= halo).
    volp = upload(volp, 0)
    if gamma is None:
        # scale 0 caches its smoothed field (one full-frame buffer fits
        # every target size); the other scales' gamma (S-max) passes run
        # cache-less in the same loop — all of it hides under the wire,
        # so phase 2 is one cached apply plus direct applies.
        smf0 = jnp.zeros_like(volp)
        parts0 = []
        parts_rest = [[] for _ in sigmas[1:]]
        for c in range(n_chunks):
            if c + 1 < n_chunks:
                volp = upload(volp, c + 1)
            smf0, smax_c = _smax_chunk_cache(smf0, volp, starts[c],
                                            sigma0, halo, chunk_z)
            parts0.append(smax_c)
            for si, sigma in enumerate(sigmas[1:]):
                parts_rest[si].append(_smax_chunk(volp, starts[c],
                                                  float(sigma), halo,
                                                  chunk_z))
        jax.device_get(parts0[-1])  # wire+first-pass barrier
        t_upload = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        g0 = jnp.max(jnp.stack(parts0)) * 0.5
        with ctx():
            for s in starts:
                best = ap_sm(best, smf0, s, g0, sigma0,
                             float(alpha), float(beta),
                             bool(bright), halo, chunk_z)
        del smf0
        # remaining scales: direct applies from the resident volume (the
        # smoothing recompute costs less than a second smoothed-field
        # cache fits; face-row semantics follow _apply_chunk — zero
        # padding smoothed into the halo, within the documented ~0.013
        # face-row envelope; interiors match the cached path exactly)
        for si, sigma in enumerate(sigmas[1:]):
            g = jnp.max(jnp.stack(parts_rest[si])) * 0.5
            with ctx():
                for s in starts:
                    best = ap(best, volp, s, g, float(sigma),
                              float(alpha), float(beta),
                              bool(bright), halo, chunk_z)
    else:
        for c in range(1, n_chunks):
            volp = upload(volp, c)
        jax.device_get(volp[0, 0, 0])
        t_upload = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        # phase 2 (compute-bound): all scales on the resident volume
        g = jnp.float32(gamma)
        with ctx():
            for sigma in sigmas:
                for s in starts:
                    best = ap(best, volp, s, g, float(sigma),
                              float(alpha), float(beta),
                              bool(bright), halo, chunk_z)
    out = best[:Z]
    jax.device_get(out[0, 0, 0])
    t_compute = _time.perf_counter() - t0
    return out, t_upload, t_compute


@functools.partial(jax.jit, static_argnames=("sigmas", "alpha", "beta",
                                             "gamma", "bright"))
def frangi_vesselness(volume, sigmas=(1.0, 2.0, 3.0), alpha=0.5, beta=0.5,
                      gamma=None, bright=True):
    """Multiscale Frangi tubularity in [0, 1]."""
    vol = jnp.asarray(volume, jnp.float32)
    best = jnp.zeros_like(vol)
    for sigma in sigmas:
        hxx, hyy, hzz, hxy, hxz, hyz = hessian_at_scale(vol, float(sigma))
        l1a, l2a, l3a = symmetric_eigvals_3x3(hxx, hyy, hzz, hxy, hxz, hyz)
        # sort by |lambda| with an explicit 3-element compare-swap network
        # (argsort/take_along_axis over the volume is far slower)
        a, b, c = l1a, l2a, l3a

        def swap_if(cond, x, y):
            return jnp.where(cond, y, x), jnp.where(cond, x, y)

        a, b = swap_if(jnp.abs(a) > jnp.abs(b), a, b)
        b, c = swap_if(jnp.abs(b) > jnp.abs(c), b, c)
        a, b = swap_if(jnp.abs(a) > jnp.abs(b), a, b)
        lam1, lam2, lam3 = a, b, c

        eps = 1e-10
        ra = jnp.abs(lam2) / (jnp.abs(lam3) + eps)
        rb = jnp.abs(lam1) / (jnp.sqrt(jnp.abs(lam2 * lam3)) + eps)
        s = jnp.sqrt(lam1 ** 2 + lam2 ** 2 + lam3 ** 2)
        g = gamma if gamma is not None else 0.5 * jnp.max(s)

        v = ((1.0 - jnp.exp(-(ra ** 2) / (2 * alpha ** 2)))
             * jnp.exp(-(rb ** 2) / (2 * beta ** 2))
             * (1.0 - jnp.exp(-(s ** 2) / (2 * g ** 2 + eps))))
        if bright:
            v = jnp.where((lam2 < 0) & (lam3 < 0), v, 0.0)
        else:
            v = jnp.where((lam2 > 0) & (lam3 > 0), v, 0.0)
        best = jnp.maximum(best, v)
    return best
