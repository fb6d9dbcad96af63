"""Pallas TPU kernels for the region-grower's hot loops.

The XLA formulations of the masked histogram and the table lookup
(ops/histogram.py) materialize a [chunk, 256] one-hot in HBM every chunk
(~22 GB of traffic per iteration at 512x512x170 — measured 39 ms + 30 ms).
These kernels keep everything in VMEM and stream the bin-index volume
once:

* ``hist``   — accumulates two masked histograms into a [2*num_bins, LANE]
  VMEM accumulator: each row of 128 voxels is broadcast-compared against a
  sublane bin-iota, adding the mask row into the matching bin sublane;
  lanes are reduced once at the end.
* ``lookup`` — the inverse: ``sum_b (iota_b == idx_row) * table[b]``
  selects table entries with no per-voxel gather (gathers execute at
  ~8 us/element on this backend).

Layout: bins on sublanes x voxels on lanes — Mosaic lowers this without
the cross-lane reshapes that the one-hot matmul formulation needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ROWS_PER_STEP = 256  # rows of 128 voxels per grid step (32k voxels)

# The package enables jax x64 globally for the f64 solver path, but Mosaic
# cannot legalize the i64 index arithmetic x64 injects — trace the kernels
# with 32-bit semantics.
_x32 = functools.partial(jax.enable_x64, False)


def _hist2_kernel(num_bins, idx_ref, m0_ref, m1_ref, out_ref, acc):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (num_bins, LANE), 0)

    def row_body(r, carry):
        idx_row = idx_ref[pl.ds(r, 1), :]                  # [1, LANE]
        match = bin_iota == idx_row                        # [B, LANE]
        m0 = m0_ref[pl.ds(r, 1), :]
        m1 = m1_ref[pl.ds(r, 1), :]
        acc[0:num_bins, :] = acc[0:num_bins, :] + jnp.where(
            match, m0, 0.0)
        acc[num_bins:2 * num_bins, :] = (
            acc[num_bins:2 * num_bins, :] + jnp.where(match, m1, 0.0))
        return carry

    jax.lax.fori_loop(0, idx_ref.shape[0], row_body, jnp.int32(0))

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[:] = jnp.sum(acc[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def masked_histograms_pallas(bin_idx_flat, masks_flat, num_bins=256):
    """f32[2, num_bins] histograms; one pass over the bin indices."""
    K, N = masks_flat.shape
    assert K == 2, "kernel is specialized for the two region masks"
    with _x32():
        return _masked_histograms_pallas_x32(bin_idx_flat, masks_flat,
                                             num_bins)


def _masked_histograms_pallas_x32(bin_idx_flat, masks_flat, num_bins):
    K, N = masks_flat.shape
    chunk = _ROWS_PER_STEP * LANE
    pad = (-N) % chunk
    idx = jnp.pad(bin_idx_flat.astype(jnp.int32), (0, pad),
                  constant_values=-1)
    m = jnp.pad(masks_flat.astype(jnp.float32), ((0, 0), (0, pad)))
    rows = idx.shape[0] // LANE
    idx2 = idx.reshape(rows, LANE)
    m0 = m[0].reshape(rows, LANE)
    m1 = m[1].reshape(rows, LANE)
    grid = rows // _ROWS_PER_STEP

    spec = pl.BlockSpec((_ROWS_PER_STEP, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hist2_kernel, num_bins),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((2 * num_bins, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * num_bins, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * num_bins, LANE), jnp.float32)],
    )(idx2, m0, m1)
    return out.reshape(2, num_bins)


def _hist1_kernel(num_bins, idx_ref, m0_ref, out_ref, acc):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (num_bins, LANE), 0)

    def row_body(r, carry):
        idx_row = idx_ref[pl.ds(r, 1), :]
        match = bin_iota == idx_row
        m0 = m0_ref[pl.ds(r, 1), :]
        acc[:] = acc[:] + jnp.where(match, m0, 0.0)
        return carry

    jax.lax.fori_loop(0, idx_ref.shape[0], row_body, jnp.int32(0))

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[:] = jnp.sum(acc[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def masked_histogram1_pallas(bin_idx_flat, mask_flat, num_bins=256):
    """f32[num_bins] histogram under one mask; one pass over the volume."""
    with _x32():
        return _masked_histogram1_pallas_x32(bin_idx_flat, mask_flat,
                                             num_bins)


def _masked_histogram1_pallas_x32(bin_idx_flat, mask_flat, num_bins):
    N = mask_flat.shape[0]
    chunk = _ROWS_PER_STEP * LANE
    pad = (-N) % chunk
    idx = jnp.pad(bin_idx_flat.astype(jnp.int32), (0, pad),
                  constant_values=-1)
    m0 = jnp.pad(mask_flat.astype(jnp.float32), (0, pad))
    rows = idx.shape[0] // LANE
    idx2 = idx.reshape(rows, LANE)
    m0 = m0.reshape(rows, LANE)
    grid = rows // _ROWS_PER_STEP

    spec = pl.BlockSpec((_ROWS_PER_STEP, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hist1_kernel, num_bins),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((num_bins, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_bins, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((num_bins, LANE), jnp.float32)],
    )(idx2, m0)
    return out.reshape(num_bins)


def _lookup_kernel(num_bins, idx_ref, table_ref, out_ref):
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (num_bins, LANE), 0)
    table_col = table_ref[:]                                # [B, 1]

    def row_body(r, carry):
        idx_row = idx_ref[pl.ds(r, 1), :]                   # [1, LANE]
        sel = jnp.where(bin_iota == idx_row, table_col, 0.0)
        out_ref[pl.ds(r, 1), :] = jnp.sum(sel, axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, idx_ref.shape[0], row_body, jnp.int32(0))


@jax.jit
def table_lookup_pallas(bin_idx_flat, table):
    """table[bin_idx] elementwise without gathers."""
    with _x32():
        return _table_lookup_pallas_x32(bin_idx_flat, table)


def _table_lookup_pallas_x32(bin_idx_flat, table):
    N = bin_idx_flat.shape[0]
    B = table.shape[0]
    chunk = _ROWS_PER_STEP * LANE
    pad = (-N) % chunk
    idx = jnp.pad(bin_idx_flat.astype(jnp.int32), (0, pad),
                  constant_values=-1)
    rows = idx.shape[0] // LANE
    idx2 = idx.reshape(rows, LANE)
    grid = rows // _ROWS_PER_STEP

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, B),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS_PER_STEP, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS_PER_STEP, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), table.dtype),
    )(idx2, table.reshape(B, 1))
    return out.reshape(-1)[:N]
