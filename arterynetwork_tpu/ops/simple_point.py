"""Simple-point predicate for 3D thinning, derived from first principles.

A foreground voxel p is *simple* (deletable without changing topology) iff

  T26(p) = 1:  the foreground restricted to the 26-neighborhood of p forms
               exactly one 26-connected component, and
  T6(p)  = 1:  the background restricted to the 18-neighborhood forms
               exactly one 6-connected component containing a face
               neighbor of p

(Bertrand & Malandain's local characterization of simple points for
(26, 6) digital topology).  Both counts are tiny graph component counts
over the 3x3x3 cube, so the predicate over all 2^26 neighborhood
configurations is *computed* here by vectorized label propagation and
cached as a bit-packed lookup table (8 MB) — no hand-transcribed tables.

The LUT build runs in JAX (seconds on an accelerator, ~a minute on CPU)
and is cached on disk.
"""

from __future__ import annotations

import os

import numpy as np

_CACHE_NAME = "simple_point_lut_v1.npz"

# ---------------------------------------------------------------------
# Neighborhood geometry (fixed, tiny)
# ---------------------------------------------------------------------
# Order the 26 neighbors by their offset index in the 3x3x3 cube scan
# (dz, dy, dx) lexicographic, skipping (0,0,0).
_OFFSETS = [(dz, dy, dx)
            for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dz == 0 and dy == 0 and dx == 0)]
N_NEIGHBORS = len(_OFFSETS)  # 26


def _adjacency(conn: int, cells):
    """Adjacency lists between cube cells under a connectivity rule.

    conn=26: cells adjacent if Chebyshev distance 1.
    conn=6: cells adjacent if Manhattan distance 1.
    """
    adj = []
    for i, a in enumerate(cells):
        row = []
        for j, b in enumerate(cells):
            if i == j:
                continue
            d = [abs(a[k] - b[k]) for k in range(3)]
            if conn == 26 and max(d) == 1:
                row.append(j)
            elif conn == 6 and sum(d) == 1:
                row.append(j)
        adj.append(row)
    return adj


_ADJ26 = _adjacency(26, _OFFSETS)
# 18-neighborhood = offsets with Manhattan distance <= 2 and Chebyshev 1
_N18_IDX = [i for i, o in enumerate(_OFFSETS) if sum(map(abs, o)) <= 2]
_N18_OFFSETS = [_OFFSETS[i] for i in _N18_IDX]
_ADJ6_18 = _adjacency(6, _N18_OFFSETS)
_FACE_IN_18 = [k for k, o in enumerate(_N18_OFFSETS) if sum(map(abs, o)) == 1]


def _count_components(masks, adj, seed_cells=None):
    """#components of True cells (restricted to ``seed_cells`` roots) via
    min-label propagation.  masks: bool[batch, C]."""
    import jax.numpy as jnp

    batch, C = masks.shape
    big = jnp.int32(C)
    labels = jnp.where(masks, jnp.arange(C, dtype=jnp.int32)[None, :], big)
    # diameter of the 3x3x3 cell graph is small; 8 rounds suffice
    for _ in range(8):
        new = labels
        for j, nbrs in enumerate(adj):
            if not nbrs:
                continue
            neighbor_min = jnp.min(labels[:, jnp.asarray(nbrs)], axis=1)
            new = new.at[:, j].set(
                jnp.where(masks[:, j],
                          jnp.minimum(new[:, j], neighbor_min), big))
        labels = new
    if seed_cells is None:
        roots = masks
        lab = labels
    else:
        sc = jnp.asarray(seed_cells)
        roots = masks[:, sc]
        lab = labels[:, sc]
    # count distinct labels among root cells: a label is counted where it
    # equals the cell's own index (component representative)
    is_rep = roots & (lab == jnp.asarray(
        [seed_cells[i] if seed_cells is not None else i
         for i in range(lab.shape[1])], dtype=jnp.int32)[None, :])
    return jnp.sum(is_rep, axis=1, dtype=jnp.int32)


def _component_count_all(masks, adj):
    """#components over all True cells. masks: bool[batch, C]."""
    import jax.numpy as jnp

    batch, C = masks.shape
    big = jnp.int32(C)
    labels = jnp.where(masks, jnp.arange(C, dtype=jnp.int32)[None, :], big)
    for _ in range(10):
        new = labels
        for j, nbrs in enumerate(adj):
            if not nbrs:
                continue
            neighbor_min = jnp.min(labels[:, jnp.asarray(nbrs)], axis=1)
            new = new.at[:, j].set(
                jnp.where(masks[:, j],
                          jnp.minimum(new[:, j], neighbor_min), big))
        labels = new
    is_rep = masks & (labels == jnp.arange(C, dtype=jnp.int32)[None, :])
    return jnp.sum(is_rep, axis=1, dtype=jnp.int32), labels


def simple_point_batch(neighborhoods):
    """Evaluate the simple-point predicate for bool[batch, 26] configs."""
    import jax.numpy as jnp

    fg = jnp.asarray(neighborhoods, dtype=bool)
    # T26: one 26-connected fg component in N26
    n_fg, _ = _component_count_all(fg, _ADJ26)
    t26_ok = n_fg == 1

    # T6: one 6-connected bg component in N18 touching a face neighbor
    bg18 = ~fg[:, jnp.asarray(_N18_IDX)]
    n_bg, labels = _component_count_all(bg18, _ADJ6_18)
    # components touching a face cell:
    face = jnp.asarray(_FACE_IN_18)
    face_labels = jnp.where(bg18[:, face], labels[:, face], jnp.int32(18))
    # count distinct representatives among all bg cells that are the min
    # label of some face-adjacent component
    is_rep = bg18 & (labels == jnp.arange(len(_N18_IDX),
                                          dtype=jnp.int32)[None, :])
    # representative j counts only if label j appears among face cells
    rep_in_face = jnp.zeros_like(is_rep)
    for k in range(len(_FACE_IN_18)):
        fl = face_labels[:, k]
        rep_in_face = rep_in_face | (
            jnp.arange(len(_N18_IDX), dtype=jnp.int32)[None, :] == fl[:, None])
    n_bg_face = jnp.sum(is_rep & rep_in_face, axis=1, dtype=jnp.int32)
    t6_ok = n_bg_face == 1

    return t26_ok & t6_ok


def build_simple_point_lut(cache_dir: str | None = None,
                           chunk_bits: int = 20) -> np.ndarray:
    """Compute (or load) the bit-packed 2^26 simple-point LUT.

    Returns uint8[2^23]: bit i of byte i>>3 is the predicate for
    neighborhood code i (bit k of the code = occupancy of _OFFSETS[k]).
    """
    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(__file__), "_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _CACHE_NAME)
    if os.path.exists(path):
        return np.load(path)["lut"]

    import jax
    import jax.numpy as jnp

    n_total = 1 << N_NEIGHBORS
    chunk = 1 << chunk_bits
    out_bits = np.zeros(n_total, dtype=bool)

    @jax.jit
    def eval_chunk(start):
        codes = start + jnp.arange(chunk, dtype=jnp.int32)
        bits = ((codes[:, None] >> jnp.arange(N_NEIGHBORS, dtype=jnp.int32)
                 [None, :]) & 1).astype(bool)
        return simple_point_batch(bits)

    for start in range(0, n_total, chunk):
        out_bits[start:start + chunk] = np.asarray(
            eval_chunk(np.int32(start)))

    lut = np.packbits(out_bits.reshape(-1, 8)[:, ::-1]).astype(np.uint8)
    np.savez_compressed(path, lut=lut)
    return lut


def lut_lookup(lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Evaluate the packed LUT at integer neighborhood codes."""
    codes = np.asarray(codes)
    return (lut[codes >> 3] >> (codes & 7)) & 1


def neighborhood_codes(mask) -> "np.ndarray":
    """26-bit neighborhood occupancy code per voxel (jnp or np array)."""
    import jax.numpy as jnp

    m = jnp.asarray(mask).astype(jnp.int32)
    code = jnp.zeros_like(m)
    for k, (dz, dy, dx) in enumerate(_OFFSETS):
        shifted = jnp.roll(m, shift=(-dz, -dy, -dx), axis=(0, 1, 2))
        # zero out wrap-around: build an edge mask per axis
        if dz == 1:
            shifted = shifted.at[-1].set(0)
        elif dz == -1:
            shifted = shifted.at[0].set(0)
        if dy == 1:
            shifted = shifted.at[:, -1].set(0)
        elif dy == -1:
            shifted = shifted.at[:, 0].set(0)
        if dx == 1:
            shifted = shifted.at[:, :, -1].set(0)
        elif dx == -1:
            shifted = shifted.at[:, :, 0].set(0)
        code = code + (shifted << k)
    return code
