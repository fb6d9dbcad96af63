"""Curve skeletonization by distance-ordered parallel thinning.

TPU-native replacement for the reference's only native component: Amy
Tabb's curve-skeletonization C++ binary, invoked via Docker
(skeletonization.py:150-162).  The contract is the same — binary vessel
mask in, 1-voxel-wide 26-connected centerline out — but the algorithm is
reformulated as iterated full-grid stencil sweeps:

* voxels are peeled in waves of increasing Euclidean distance
  (distance-ordered thinning keeps the skeleton centered, like the
  reference binary's medial-ordering);
* within a wave, deletions run in the 8 parity subfields of the 2x2x2
  lattice decomposition, so no two simultaneously deleted voxels are
  26-adjacent (the standard subfield guarantee for parallel thinning);
* a voxel may be deleted only if it is *simple* — the full-grid
  simple-point test evaluates Bertrand's T26/T6 component-count
  characterization per voxel by label propagation over the 26
  neighbor bitplanes (see ops/simple_point.py for the derivation; no
  per-voxel table gathers, which are pathologically slow on this TPU) —
  and not a curve endpoint (exactly one foreground 26-neighbor), which
  preserves vessel tips.

A sequential C++ implementation with the same predicate (native/) is the
gold reference for parity tests and the fast host path for very large
volumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .edt import edt_squared
from .simple_point import _ADJ26, _FACE_IN_18, _N18_IDX, _OFFSETS, _adjacency, _N18_OFFSETS

_ADJ6_18 = _adjacency(6, _N18_OFFSETS)


def _neighbor_planes(mask):
    """bool[26, *vol]: plane k = occupancy of neighbor at _OFFSETS[k]."""
    planes = []
    for (dz, dy, dx) in _OFFSETS:
        s = mask
        # shift so that plane[p] = mask[p + offset], zero-padded
        for axis, d in enumerate((dz, dy, dx)):
            if d == 0:
                continue
            pad = [(0, 0)] * 3
            n = mask.shape[axis]
            if d == 1:
                pad[axis] = (0, 1)
                s = jax.lax.slice_in_dim(jnp.pad(s, pad), 1, n + 1, axis=axis)
            else:
                pad[axis] = (1, 0)
                s = jax.lax.slice_in_dim(jnp.pad(s, pad), 0, n, axis=axis)
        planes.append(s)
    return jnp.stack(planes)


def _count_components_planes(occ, adj, n_rounds=8):
    """Component count per voxel of the occupied cube cells.

    occ: bool[C, *vol].  Returns (count int8[*vol], labels int8[C, *vol]).
    """
    C = occ.shape[0]
    big = jnp.int8(C)
    cell_ids = jnp.arange(C, dtype=jnp.int8).reshape((C,) + (1,) * (occ.ndim - 1))
    labels = jnp.where(occ, cell_ids, big)
    for _ in range(n_rounds):
        new_planes = []
        for j, nbrs in enumerate(adj):
            if nbrs:
                nmin = labels[jnp.asarray(nbrs)].min(axis=0)
                new_planes.append(jnp.where(occ[j],
                                            jnp.minimum(labels[j], nmin), big))
            else:
                new_planes.append(labels[j])
        labels = jnp.stack(new_planes)
    is_rep = occ & (labels == cell_ids)
    count = jnp.sum(is_rep, axis=0).astype(jnp.int8)
    return count, labels


def simple_point_mask(mask):
    """Full-grid simple-point predicate (26, 6 topology). bool[*vol]."""
    planes = _neighbor_planes(mask)

    # T26 == 1: one 26-component of foreground in N26.  n_rounds=8 is the
    # exact worst case for min-label propagation on the 26-cell
    # 26-adjacency graph (brute-forced over all configurations).
    n_fg, _ = _count_components_planes(planes, _ADJ26)
    t26_ok = n_fg == 1

    # T6 == 1: one 6-component of background in N18 touching a face cell.
    # The worst case for the 18-cell 6-adjacency graph is 10 rounds
    # (brute-forced over all 2^18 configs); fewer rounds misclassify
    # ~0.35% of neighborhoods as non-simple vs the C++ oracle and leave
    # the skeleton under-thinned.
    bg18 = ~planes[jnp.asarray(_N18_IDX)]
    n_bg, labels = _count_components_planes(bg18, _ADJ6_18, n_rounds=10)
    C18 = len(_N18_IDX)
    cell_ids = jnp.arange(C18, dtype=jnp.int8).reshape(
        (C18,) + (1,) * (mask.ndim))
    is_rep = bg18 & (labels == cell_ids)
    rep_in_face = jnp.zeros_like(is_rep)
    for k in _FACE_IN_18:
        fl = jnp.where(bg18[k], labels[k], jnp.int8(C18))
        rep_in_face = rep_in_face | (cell_ids == fl[None])
    n_bg_face = jnp.sum(is_rep & rep_in_face, axis=0).astype(jnp.int8)
    t6_ok = n_bg_face == 1

    return mask & t26_ok & t6_ok


def _fg_neighbor_count(mask):
    planes = _neighbor_planes(mask)
    return jnp.sum(planes, axis=0, dtype=jnp.int8)


def _subfield_index(shape):
    z = np.arange(shape[0]) % 2
    y = np.arange(shape[1]) % 2
    x = np.arange(shape[2]) % 2
    return (z[:, None, None] * 4 + y[None, :, None] * 2
            + x[None, None, :]).astype(np.int8)


@functools.partial(jax.jit, static_argnames=("max_waves", "preserve_endpoints"))
def skeletonize(mask, max_waves: int = 64, preserve_endpoints: bool = True):
    """Thin a binary volume to its curve skeleton.

    Returns a bool volume of centerline voxels.  Topology (26-fg / 6-bg)
    is preserved; curve endpoints are kept so terminal branches survive.
    """
    fg = jnp.asarray(mask) != 0
    d2 = edt_squared(fg, band=32)
    subfield = jnp.asarray(_subfield_index(fg.shape))

    def delete_pass(fg, level2):
        """One peel attempt at the current distance level; 8 subfields."""
        deleted_any = jnp.bool_(False)
        for sf in range(8):
            simple = simple_point_mask(fg)
            ncnt = _fg_neighbor_count(fg)
            cand = fg & simple & (d2 <= level2) & (subfield == sf)
            if preserve_endpoints:
                cand = cand & (ncnt > 1)
            # voxels with no fg neighbor are isolated points: keep
            cand = cand & (ncnt > 0)
            fg = fg & ~cand
            deleted_any = deleted_any | jnp.any(cand)
        return fg, deleted_any

    def wave_body(state):
        fg, level, stalled = state
        level2 = (level.astype(jnp.float32)) ** 2 + 0.5
        fg, deleted = delete_pass(fg, level2)
        # stay at this level until stable, then move outward
        level = jnp.where(deleted, level, level + 1)
        stalled = jnp.where(deleted, 0, stalled + 1)
        return fg, level, stalled

    def wave_cond(state):
        fg, level, stalled = state
        max_d2 = jnp.max(jnp.where(fg, d2, 0.0))
        return jnp.logical_and(
            (level.astype(jnp.float32)) ** 2 <= max_d2 + 2.0,
            stalled < max_waves)

    fg, _, _ = jax.lax.while_loop(
        wave_cond, wave_body,
        (fg, jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)))

    # final cleanup passes at unlimited level until fixed point
    def final_body(state):
        fg, deleted, it = state
        fg, deleted = delete_pass(fg, jnp.float32(1e12))
        return fg, deleted, it + 1

    def final_cond(state):
        _, deleted, it = state
        return jnp.logical_and(deleted, it < max_waves)

    fg, _, _ = jax.lax.while_loop(final_cond, final_body,
                                  (fg, jnp.bool_(True), jnp.int32(0)))
    return fg
