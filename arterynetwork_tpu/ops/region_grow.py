"""Variational region growing as a full-grid TPU kernel.

TPU-native reformulation of ``variationalRegionGrowing``
(variationalRegionGrowing.py:10-282), the Parzen/Gaussian two-region
competition segmenter.  The reference keeps explicit boundary *lists* and
repairs per-voxel probability fields incrementally in Python loops — pure
bookkeeping that exists because a CPU cannot afford full sweeps.  Here every
iteration is a fused full-grid computation:

1. **Region statistics by histogram.**  The per-voxel score
   ``sum_q A*exp(-0.5*H*(I_q - I_p)^2)`` over a region depends only on the
   *intensity* of p and the intensity histogram of the region.  Quantizing
   intensities into B bins turns both region sums into one BxB Gaussian
   kernel matvec: ``prob_of_bin = K @ hist`` — exact whenever the data sits
   on the bin grid (integer/binary phantoms), and a B-bin approximation for
   continuous vesselness data.  This replaces O(|boundary| * |region|)
   Python work with one tiny matmul and two gathers.

   Fixed-point agreement with the boundary-list reference oracle on
   continuous noisy data is ~99.997% and *independent of B* (measured at
   B = 256..16384, and unchanged when the input is pre-quantized to the
   bin grid, i.e. when the histogram math is exact): the residual few
   voxels come from the reference's order-dependent incremental
   probability repair flipping near-ties differently from a synchronous
   sweep — SURVEY.md's documented "order-dependent tie behavior" hard
   part.  Parity is exact on the reference's own phantom fixtures.
2. **Boundary masks by dilation.**  inner boundary = segmented voxels with
   an unsegmented 26-neighbor; outer boundary = active unsegmented voxels
   with a segmented 26-neighbor (reference update(), :124-155).
3. **Flip rule.**  On boundary voxels, flip where
   ``xor(segmented, innerProb/innerSize >= outerProb/outerSize)``
   (reference :79-88, including the >= tie behavior).
4. **Exclusion dynamics.**  State 4 (excluded) voxels join the outer
   region (state 3) when the growing front reaches within two hops
   (reference 4->3 conversions, :137, :167-180).  Parity with the
   reference's incremental order is defined at the converged fixed point
   (SURVEY.md "hard parts").

Termination matches the reference (:91-104): no flips, segment size cap
(checked *before* applying the iteration's flips), or the iteration cap.
The 120 s wall-clock cap becomes an optional host-side timeout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .histogram import (masked_histogram_one,
                        masked_histograms_best, sign_lookup)
from .stencil import dilate26

# Gaussian normalization constant (variationalRegionGrowing.py:7).
A_NORM = float((2.0 * np.pi) ** -0.5)

DEFAULT_H = 2.25
DEFAULT_MAX_SEGMENT_SIZE = 5000
DEFAULT_ITER_MAX = 200


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RegionGrowResult:
    segmented_map: jax.Array   # bool[shape]
    active_map: jax.Array      # bool[shape]; ~active == reference state 4
    iterations: jax.Array      # i32 scalar: number of applied updates
    segmented_count: jax.Array  # i32 scalar
    stop_reason: jax.Array     # i32: 0=converged, 1=size cap, 2=iter cap


def _quantize(data, num_bins):
    vmin = jnp.min(data)
    vmax = jnp.max(data)
    span = jnp.maximum(vmax - vmin, 1e-30)
    idx = jnp.clip(jnp.round((data - vmin) / span * (num_bins - 1)),
                   0, num_bins - 1).astype(jnp.int32)
    values = vmin + jnp.arange(num_bins, dtype=data.dtype) * span / (num_bins - 1)
    return idx, values


def region_grow(
    data,
    seed_mask,
    excluded_mask=None,
    H: float = DEFAULT_H,
    max_segment_size: int = DEFAULT_MAX_SEGMENT_SIZE,
    iter_max: int = DEFAULT_ITER_MAX,
    num_bins: int = 256,
    backend: str = "auto",
) -> RegionGrowResult:
    """Grow a region from ``seed_mask`` over ``data``.

    Parameters mirror the reference: ``H`` controls segmentation size
    (larger H -> smaller segmentation), ``max_segment_size`` and
    ``iter_max`` cap the growth (variationalRegionGrowing.py:10, 56).
    ``excluded_mask`` marks reference state-4 voxels.

    ``backend``: "auto" picks the fused single-pass Pallas sweep
    (ops/region_grow_fused.py) on a single TPU device when there is no
    excluded state; "xla" forces the full-grid XLA path (the one that
    shards under GSPMD); "fused" forces the Pallas path.
    """
    use_fused = (backend in ("auto", "fused")
                 and excluded_mask is None
                 and getattr(data, "ndim", None) == 3
                 and num_bins == 256
                 and jax.default_backend() == "tpu")
    if use_fused:
        # the banded large-tile variant is correct (interpret-mode parity
        # tests) and compiles standalone, but inside the full driver
        # program the remote AOT compiler SIGABRTs at some shapes and a
        # crashed compile wedges the daemon — keep auto on the proven
        # small-tile kernel and fall back to XLA above its budget until
        # the compiler issue is resolved (backend="fused" opts in)
        from .region_grow_fused import fused_tile_fits
        use_fused = fused_tile_fits(data.shape)
    if use_fused and isinstance(data, jax.Array):
        use_fused = len(data.devices()) == 1
    if backend == "fused" or use_fused:
        if backend == "fused" and (excluded_mask is not None
                                   or num_bins != 256):
            raise ValueError(
                "backend='fused' supports neither excluded_mask nor "
                "num_bins != 256 — use backend='xla' (or 'auto', which "
                "only picks the fused kernel when both are default)")
        from .region_grow_fused import region_grow_fused
        return region_grow_fused(data, seed_mask, H=H,
                                 max_segment_size=max_segment_size,
                                 iter_max=iter_max)
    return _region_grow_xla(data, seed_mask, excluded_mask, H,
                            max_segment_size, iter_max, num_bins)


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "iter_max", "max_segment_size"))
def _region_grow_xla(
    data,
    seed_mask,
    excluded_mask=None,
    H: float = DEFAULT_H,
    max_segment_size: int = DEFAULT_MAX_SEGMENT_SIZE,
    iter_max: int = DEFAULT_ITER_MAX,
    num_bins: int = 256,
) -> RegionGrowResult:
    """Full-grid XLA implementation (shards under GSPMD)."""
    dtype = jnp.float32 if data.dtype not in (jnp.float64,) else data.dtype
    data = data.astype(dtype)
    seg0 = seed_mask.astype(jnp.bool_)
    if excluded_mask is None:
        active0 = jnp.ones_like(seg0)
    else:
        active0 = ~excluded_mask.astype(jnp.bool_)
    # Initial update: the front activates excluded voxels it touches
    # (reference :137 runs during the initial boundary build).
    active0 = active0 | dilate26(seg0)

    bin_idx, bin_values = _quantize(data, num_bins)
    bin_idx_flat = bin_idx.reshape(-1)

    # BxB Gaussian kernel between bin values.
    diff = bin_values[:, None] - bin_values[None, :]
    K = (A_NORM * jnp.exp(-0.5 * H * diff * diff)).astype(dtype)

    # With no excluded voxels (the common case) the active mask is
    # identically True: skip its dilations and masking entirely, and use
    # outer_hist = total_hist - inner_hist (the two region masks are
    # disjoint and their union is the full volume), halving histogram work.
    track_active = excluded_mask is not None
    if not track_active:
        hist_all = masked_histogram_one(
            bin_idx_flat, jnp.ones_like(bin_idx_flat, jnp.bool_),
            num_bins).astype(dtype)

    def compute_flips(seg, active):
        if track_active:
            inner_bnd = seg & dilate26(~seg)
            outer_bnd = (~seg) & active & dilate26(seg)
            all_bnd = inner_bnd | outer_bnd
        else:
            # boundary = mixed 27-neighborhood; the dilations cover the
            # seg/unseg split of the union themselves
            all_bnd = dilate26(seg) & dilate26(~seg)

        seg_flat = seg.reshape(-1)
        if track_active:
            outer_region_flat = ((~seg) & active).reshape(-1)
            hists = masked_histograms_best(
                bin_idx_flat, jnp.stack([seg_flat, outer_region_flat]),
                num_bins)
            inner_hist = hists[0].astype(dtype)
            outer_hist = hists[1].astype(dtype)
        else:
            inner_hist = masked_histogram_one(
                bin_idx_flat, seg_flat, num_bins).astype(dtype)
            outer_hist = hist_all - inner_hist
        inner_size = jnp.maximum(jnp.sum(inner_hist), jnp.asarray(1.0, dtype))
        outer_size = jnp.maximum(jnp.sum(outer_hist), jnp.asarray(1.0, dtype))

        # diff(b) = innerProbNorm(b) - outerProbNorm(b); flip test is
        # diff[bin(p)] >= 0 (reference >= tie behavior, :87); evaluated
        # via packed sign bits (one fused elementwise pass, no gather)
        diff = (K @ inner_hist) / inner_size - (K @ outer_hist) / outer_size
        inner_ge_outer = sign_lookup(bin_idx, diff)
        flips = all_bnd & jnp.logical_xor(seg, inner_ge_outer)
        return flips

    def cond(state):
        _, _, it, _, stop = state
        return stop < 0

    def body(state):
        # Unconditional apply + post-checked size cap: the state that
        # first reaches the cap is final (the reference returns it
        # without applying the NEXT update, :101-104), so checking the
        # cap after the update that crossed it — and never entering the
        # next body — is equivalent and drops a full-volume select.
        seg, active, it, count, _ = state
        flips = compute_flips(seg, active)
        n_pos = jnp.sum(flips & ~seg, dtype=jnp.int32)
        n_neg = jnp.sum(flips & seg, dtype=jnp.int32)
        n_flips = n_pos + n_neg

        converged = n_flips == 0
        seg_new = jnp.logical_xor(seg, flips)  # no-op when converged
        if track_active:
            active_new = jnp.where(converged, active,
                                   active | dilate26(dilate26(flips)))
        else:
            active_new = active
        count_new = count + n_pos - n_neg
        size_capped = count_new >= max_segment_size
        it_new = it + (~converged).astype(jnp.int32)

        stop = jnp.where(converged & ~size_capped, 0,
                         jnp.where(size_capped, 1,
                                   jnp.where(it_new >= iter_max, 2, -1)))
        stop = stop.astype(jnp.int32)
        return seg_new, active_new, it_new, count_new, stop

    count0 = jnp.sum(seg0, dtype=jnp.int32)
    # a seed already at/over the size cap never updates (reference
    # semantics: the capped state is returned unmodified)
    stop0 = jnp.where(count0 >= max_segment_size, 1, -1).astype(jnp.int32)
    state0 = (seg0, active0, jnp.zeros((), jnp.int32), count0, stop0)
    seg, active, it, count, stop = jax.lax.while_loop(cond, body, state0)
    return RegionGrowResult(segmented_map=seg, active_map=active,
                            iterations=it, segmented_count=count,
                            stop_reason=stop)


# ----------------------------------------------------------------------
# Reference-style API (valueMap in, valueMap out)
# ----------------------------------------------------------------------
def region_grow_value_map(data, value_map, H=DEFAULT_H,
                          max_segment_size=DEFAULT_MAX_SEGMENT_SIZE,
                          iter_max=DEFAULT_ITER_MAX, num_bins=256):
    """Drop-in equivalent of ``variationalRegionGrowing(dataArray, valueMap)``.

    ``value_map`` uses the reference encoding — 0: inside, 1: inner
    boundary, 2: outer boundary, 3: outside, 4: excluded — and the function
    returns ``(segmented_coords, segmented_map, value_map)`` like the
    reference (variationalRegionGrowing.py:27-36).
    """
    value_map = np.asarray(value_map)
    seed = (value_map == 0) | (value_map == 1)
    excluded = value_map == 4
    res = region_grow(jnp.asarray(data), jnp.asarray(seed),
                      jnp.asarray(excluded), H=H,
                      max_segment_size=max_segment_size,
                      iter_max=iter_max, num_bins=num_bins)
    seg = np.asarray(res.segmented_map)
    active = np.asarray(res.active_map)
    vm = reconstruct_value_map(seg, active)
    coords = np.argwhere(seg)
    return coords, seg.astype(np.int64), vm


def reconstruct_value_map(seg, active):
    """Rebuild the reference's 5-state valueMap from the two masks."""
    seg_j = jnp.asarray(seg)
    active_j = jnp.asarray(active)
    inner_bnd = seg_j & dilate26(~seg_j)
    outer_bnd = (~seg_j) & active_j & dilate26(seg_j)
    vm = jnp.where(seg_j, jnp.where(inner_bnd, 1, 0),
                   jnp.where(outer_bnd, 2, jnp.where(active_j, 3, 4)))
    return np.asarray(vm).astype(np.int64)
