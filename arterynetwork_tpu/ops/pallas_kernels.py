"""Pallas TPU kernels for the region-grower's hot loops.

The XLA formulations of the masked histogram and the table lookup
(ops/histogram.py) materialize a [chunk, 256] one-hot in HBM every chunk
(~22 GB of traffic per iteration at 512x512x170 — measured 39 ms + 30 ms).
These kernels keep everything in VMEM and stream the bin-index volume
once:

* ``hist``   — nibble-factorized MXU accumulation: with bins = 16*hi+lo,
  ``hist[hi, lo] = sum_n mask_n * onehot16(hi_n) * onehot16(lo_n)`` is a
  batched (16, LANE) x (LANE, 16) contraction of two SIXTEEN-wide
  one-hots.  A direct 256-wide broadcast-compare costs ~770 VPU ops per
  voxel (measured 11 ms per sweep at 512x512x170 — the dominant cost of
  the full-grid region grower); the factorized form builds 32 compare
  lanes per voxel and moves the combination onto the MXU (~0.8 ms).
  Products are 0/1 so bf16 operands with f32 accumulation are exact.
* ``lookup`` — ``sum_b (iota_b == idx_row) * table[b]`` selects table
  entries with no per-voxel gather (gathers execute at ~8 us/element on
  this backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ROWS_PER_STEP = 512  # rows of 128 voxels per grid step (64k voxels)

# The package enables jax x64 globally for the f64 solver path, but Mosaic
# cannot legalize the i64 index arithmetic x64 injects — trace the kernels
# with 32-bit semantics.
_x32 = functools.partial(jax.enable_x64, False)


def _nibble_onehots(idx):
    """(R, LANE) i32 bins -> hi/lo one-hots (R, 16, LANE) bf16."""
    R = idx.shape[0]
    hi = (idx >> 4)[:, None, :]
    lo = (idx & 15)[:, None, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, 16, LANE), 1)
    oh_hi = (hi == iota).astype(jnp.bfloat16)
    oh_lo = (lo == iota).astype(jnp.bfloat16)
    return oh_hi, oh_lo


def _nibble_accumulate(oh_hi, oh_lo, m):
    """sum_r (oh_hi[r] * m[r]) @ oh_lo[r]^T -> (16, 16) f32 partial
    histogram (hist[hi, lo]); 0/1 products, exact in bf16 x bf16 -> f32.
    """
    a = oh_hi * m[:, None, :].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        a, oh_lo,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (R, 16, 16)
    return jnp.sum(part, axis=0)


def _hist2_kernel(num_bins, idx_ref, m0_ref, m1_ref, out_ref, acc):
    del num_bins
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    idx = idx_ref[:]
    oh_hi, oh_lo = _nibble_onehots(idx)
    acc[0:16, :] = acc[0:16, :] + _nibble_accumulate(oh_hi, oh_lo,
                                                     m0_ref[:])
    acc[16:32, :] = acc[16:32, :] + _nibble_accumulate(oh_hi, oh_lo,
                                                       m1_ref[:])

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("num_bins",))
def masked_histograms_pallas(bin_idx_flat, masks_flat, num_bins=256):
    """f32[2, num_bins] histograms; one pass over the bin indices."""
    K, N = masks_flat.shape
    assert K == 2, "kernel is specialized for the two region masks"
    assert num_bins <= 256, "nibble factorization covers 256 bins"
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
        out_specs=pl.BlockSpec((32, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((32, 16), jnp.float32)],
    )(idx2, m0, m1)
    # acc rows are [hi], lanes [lo]; bin = 16*hi + lo is the row-major
    # flattening of each 16x16 half
    return out.reshape(2, 256)[:, :num_bins]


def _hist1_kernel(num_bins, idx_ref, m0_ref, out_ref, acc):
    del num_bins
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    oh_hi, oh_lo = _nibble_onehots(idx_ref[:])
    acc[:] = acc[:] + _nibble_accumulate(oh_hi, oh_lo, m0_ref[:])

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("num_bins",))
def masked_histogram1_pallas(bin_idx_flat, mask_flat, num_bins=256):
    """f32[num_bins] histogram under one mask; one pass over the volume."""
    assert num_bins <= 256, "nibble factorization covers 256 bins"
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
        out_specs=pl.BlockSpec((16, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 16), jnp.float32)],
    )(idx2, m0)
    return out.reshape(256)[:num_bins]


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
