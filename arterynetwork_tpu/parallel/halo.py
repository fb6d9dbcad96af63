"""Halo exchange for sharded volumetric stencils.

The scaling dimension of this framework is volume size (SURVEY.md §5
"long-context analog"): volumes shard over a device mesh and every stencil
pass needs a 1-voxel halo from the neighboring shard.  Two mechanisms:

* **implicit** — the voxel kernels are pure shift/pad/slice jnp programs,
  so ``jit`` with sharded inputs lets GSPMD insert the collective-permutes
  automatically.  This is the default path (zero code).
* **explicit** — ``halo_exchange`` under ``shard_map`` trades a pair of
  ``ppermute``s per axis for full control, which the Pallas kernels and
  custom schedules need.  Edge shards receive zeros (volume boundary),
  matching the kernels' zero-padding convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(block, axis_name: str, axis: int, halo: int = 1):
    """Inside shard_map: pad ``block`` along ``axis`` with ``halo`` planes
    from the mesh neighbors (zeros at the mesh edge).

    Returns the padded block (size + 2*halo along ``axis``)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    lo_slice = jax.lax.slice_in_dim(block, 0, halo, axis=axis)
    hi_slice = jax.lax.slice_in_dim(
        block, block.shape[axis] - halo, block.shape[axis], axis=axis)

    # send my low face to the left neighbor (they receive it as their
    # high halo), and my high face to the right neighbor
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(hi_slice, axis_name, right)
    from_right = jax.lax.ppermute(lo_slice, axis_name, left)

    zero = jnp.zeros_like(lo_slice)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, block, from_right], axis=axis)


def make_volume_mesh(devices=None, axis_names=("sx", "sy")):
    """A mesh for spatial volume sharding.  With 8 devices and two axes
    the default is 2x4."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    import numpy as np
    if len(axis_names) == 1:
        shape = (n,)
    else:
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (a, n // a)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def shard_volume(volume, mesh: Mesh, axes=("sx", "sy")):
    """Place a 3D volume with the leading dims sharded over the mesh."""
    spec = P(*axes, *(None,) * (volume.ndim - len(axes)))
    return jax.device_put(volume, NamedSharding(mesh, spec))


def sharded_dilate26(mask, mesh: Mesh, axes=("sx", "sy")):
    """Explicit shard_map dilation with halo exchange (the stencil
    pattern all sharded voxel kernels follow)."""
    from jax import shard_map

    from ..ops.stencil import dilate26

    spec = P(*axes, *(None,) * (mask.ndim - len(axes)))

    def local(block):
        for dim, name in enumerate(axes):
            block = halo_exchange(block, name, dim, halo=1)
        block = dilate26(block)
        # strip halos
        for dim, _ in enumerate(axes):
            block = jax.lax.slice_in_dim(
                block, 1, block.shape[dim] - 1, axis=dim)
        return block

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(mask)
