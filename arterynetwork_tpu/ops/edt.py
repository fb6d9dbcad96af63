"""Euclidean distance transform as vectorized XLA passes.

Replaces scipy ``distance_transform_edt`` (used by the reference for
brain-boundary masking, generateVesselVolume.py:183, and vessel radius
recovery, manualCorrectionGUI.py:243-249).

The exact 3D squared EDT is separable: per axis,

    g(i) = min_j  f(j) + s^2 (i - j)^2

Felzenszwalb's lower-envelope scan is inherently sequential, so instead
the min-plus convolution is evaluated directly in one of two
vectorized forms:

* **banded** (default): ``d = min_k shift(f, k) + s^2 k^2`` over
  ``k in [-W, W]`` — a fori-loop of full-volume shift-mins.  Exact wherever
  the true distance is <= W voxels (vessel radii are O(10), so W=32 is
  exact for radius extraction); distances beyond the band are clamped to
  the band radius.
* **exact**: blocked min-plus against the full quadratic kernel — O(N*L)
  VPU work per axis, still entirely data-parallel.

Both run on padded static shapes and fuse under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e12


def _axis_minplus_banded(f, axis, band, s2):
    """min_k f(j+k) + s2*k^2 for |k| <= band.

    Statically unrolled slices (dynamic_slice in a fori_loop measured
    ~150x slower on this TPU backend and pathologically slow to
    compile)."""
    n = f.shape[axis]
    band = min(band, n - 1)
    pad = [(0, 0)] * f.ndim
    pad[axis] = (band, band)
    fp = jnp.pad(f, pad, constant_values=_INF)
    out = jnp.full_like(f, _INF)
    for i in range(2 * band + 1):
        k = i - band
        shifted = jax.lax.slice_in_dim(fp, i, i + n, axis=axis)
        out = jnp.minimum(out, shifted + s2 * (k * k))
    return out


def _axis_minplus_exact(f, axis, s2, block=64):
    """Exact min-plus with the quadratic kernel, blocked over outputs."""
    # Move target axis last for contiguous vector work.
    f_moved = jnp.moveaxis(f, axis, -1)
    lead_shape = f_moved.shape[:-1]
    L = f_moved.shape[-1]
    f2 = f_moved.reshape(-1, L)
    j = jnp.arange(L)

    pad_i = (-L) % block
    n_blocks = (L + pad_i) // block

    def one_block(b):
        i = b * block + jnp.arange(block)          # [block]
        q = s2 * (i[:, None] - j[None, :]) ** 2    # [block, L]
        # out[r, i] = min_j f2[r, j] + q[i, j]
        return jnp.min(f2[:, None, :] + q[None, :, :], axis=-1)

    blocks = jax.lax.map(one_block, jnp.arange(n_blocks))  # [nb, R, block]
    out = jnp.moveaxis(blocks, 0, 1).reshape(f2.shape[0], n_blocks * block)
    out = out[:, :L]
    return jnp.moveaxis(out.reshape(lead_shape + (L,)), -1, axis)


@functools.partial(jax.jit, static_argnames=("band", "sampling"))
def edt_squared(mask, band: int | None = 32, sampling=None):
    """Squared Euclidean distance to the nearest background (zero) voxel.

    mask: nonzero = foreground (same semantics as scipy
    distance_transform_edt).  ``band=None`` computes the exact transform;
    an integer band computes distances exactly up to ``band`` voxels per
    axis and clamps beyond (sufficient for vessel-radius recovery).
    ``sampling``: optional per-axis physical spacing tuple.
    """
    fg = jnp.asarray(mask) != 0
    if sampling is None:
        sampling = (1.0,) * fg.ndim
    d2 = jnp.where(fg, jnp.float32(_INF), jnp.float32(0.0))
    for axis in range(fg.ndim):
        s2 = float(sampling[axis]) ** 2
        if band is None:
            d2 = _axis_minplus_exact(d2, axis, s2)
        else:
            d2 = _axis_minplus_banded(d2, axis, band, s2)
    if band is not None:
        # clamp unreached voxels to the band radius
        total = sum((float(sampling[a]) * band) ** 2 for a in range(fg.ndim))
        d2 = jnp.minimum(d2, jnp.float32(total))
    return d2


def edt(mask, band: int | None = 32, sampling=None):
    """Euclidean distance transform (sqrt of edt_squared)."""
    return jnp.sqrt(edt_squared(mask, band=band, sampling=sampling))
