"""3D stencil primitives shared by the voxel kernels.

All neighborhood ops use the 26-connected (3x3x3) structuring element, the
same neighborhood as the reference's ``get_neighbours``
(variationalRegionGrowing.py:263-282).  Dilation with a full cube is
separable into three 1D max-passes, which XLA fuses into cheap
shift-and-max chains; out-of-volume neighbors contribute the identity
(False/0), matching the reference's bounds clipping.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_max3(x, axis):
    """Max over the 3-window along ``axis`` (zero/False padding).

    Static slices, not jnp.take: gathers are pathologically slow on this
    TPU backend."""
    import jax
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    if x.dtype == jnp.bool_:
        return lo | mid | hi
    return jnp.maximum(jnp.maximum(lo, mid), hi)


def dilate26(mask):
    """Binary dilation by the 3x3x3 cube (includes the center)."""
    out = mask
    for axis in range(mask.ndim):
        out = _axis_max3(out, axis)
    return out


def has_neighbor26(mask):
    """True where a voxel has at least one 26-neighbor in ``mask``
    (excluding the voxel itself)."""
    d = dilate26(mask)
    # dilate includes the center; remove the self-only contribution:
    # a voxel with d=True but mask=False certainly has a neighbor.  For
    # voxels inside mask, check the dilation of mask-without-self is not
    # expressible separably; instead use sum of neighbors.
    return neighbor_count26(mask) > 0


def _axis_sum3(x, axis):
    import jax
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    return lo + mid + hi


def neighbor_count26(mask):
    """Number of 26-neighbors of each voxel that are in ``mask``
    (excluding the voxel itself)."""
    x = mask.astype(jnp.int32)
    s = x
    for axis in range(mask.ndim):
        s = _axis_sum3(s, axis)
    return s - x


def neighbor_count6(mask):
    """Number of 6-neighbors (faces) of each voxel in ``mask``."""
    x = mask.astype(jnp.int32)
    total = jnp.zeros_like(x)
    for axis in range(mask.ndim):
        total = total + _axis_sum3(x, axis) - x
    return total
