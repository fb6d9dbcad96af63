"""Masked intensity histograms.

The region grower needs, per iteration, intensity histograms of the inner
(segmented) and outer (active, unsegmented) regions.  Strategy by backend:

* **TPU** — a scatter-add histogram lowers to a sort (~400 ms for a
  512x512x170 volume, measured).  Instead the bin indices stream through a
  chunked ``one_hot(bin)^T @ masks`` contraction: all K masks share one
  pass over the volume and the accumulation runs on the MXU (~40 ms
  measured for K=2 at 512x512x170; the device-side compaction
  alternatives — jnp.nonzero + gather — are sort-bound and slower).
* **CPU/GPU** — plain scatter-add, which is fast there and bit-exact.

Counts from the chunked-matmul path are exact: one-hot entries and mask
entries are 0/1 (exact in bfloat16), each per-chunk partial is an integer
<= chunk (131072 < 2^24, exact in f32), and the cross-chunk accumulation
runs in int32 — so bins beyond 2^24 (e.g. the background bin of a
512x512x170 volume, ~45M voxels) stay exact until the final cast back to
f32 (correctly rounded, <=0.5 ulp ~ 2 counts at 45M).  The Pallas kernels
accumulate their final lane reduction in f32, so they are exact only
below 2^24 per bin; the region grower's decision quantities are
ratio-normalized and insensitive at that scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DEFAULT_CHUNK = 131072


@functools.partial(jax.jit, static_argnames=("num_bins",))
def _masked_histograms_scatter(bin_idx_flat, masks_flat, num_bins):
    def one(mask):
        return jnp.zeros((num_bins,), jnp.float32).at[bin_idx_flat].add(
            mask.astype(jnp.float32))
    return jax.vmap(one)(masks_flat)


@functools.partial(jax.jit, static_argnames=("num_bins", "chunk"))
def _masked_histograms_matmul(bin_idx_flat, masks_flat, num_bins,
                              chunk=_DEFAULT_CHUNK):
    K, N = masks_flat.shape
    pad = (-N) % chunk
    idx = jnp.pad(bin_idx_flat.astype(jnp.int32), (0, pad),
                  constant_values=-1)  # -1 matches no bin
    masks = jnp.pad(masks_flat, ((0, 0), (0, pad)))
    n_chunks = idx.shape[0] // chunk
    idx_c = idx.reshape(n_chunks, chunk)
    m_c = masks.reshape(K, n_chunks, chunk).transpose(1, 0, 2)
    iota = jnp.arange(num_bins, dtype=jnp.int32)

    def step(acc, args):
        ic, mc = args
        onehot = (ic[:, None] == iota[None, :]).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            mc.astype(jnp.bfloat16), onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # per-chunk partials are integers <= chunk (exact in f32);
        # cross-chunk accumulation in int32 keeps bins > 2^24 exact
        return acc + part.astype(jnp.int32), None

    acc0 = jnp.zeros((K, num_bins), jnp.int32)
    acc, _ = jax.lax.scan(step, acc0, (idx_c, m_c))
    return acc.astype(jnp.float32)


def masked_histograms(bin_idx_flat, masks_flat, num_bins: int = 256):
    """Histograms of ``bin_idx`` under K boolean masks -> f32[K, num_bins]."""
    if jax.default_backend() == "tpu":
        return _masked_histograms_matmul(bin_idx_flat, masks_flat, num_bins)
    return _masked_histograms_scatter(bin_idx_flat, masks_flat, num_bins)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _table_lookup_matmul(bin_idx_flat, table, chunk=_DEFAULT_CHUNK):
    """table[bin_idx] for a full volume, without a gather.

    Per-voxel gathers execute at ~8 us/element on this TPU backend
    (measured: 371 s for 45M lookups), so the lookup is expressed as a
    chunked ``one_hot(bin) @ table`` contraction instead.  Exact: each
    one-hot row has a single 1, so the f32 dot returns table[bin] bit-for-bit.
    """
    N = bin_idx_flat.shape[0]
    B = table.shape[0]
    pad = (-N) % chunk
    idx = jnp.pad(bin_idx_flat.astype(jnp.int32), (0, pad),
                  constant_values=-1)
    n_chunks = idx.shape[0] // chunk
    idx_c = idx.reshape(n_chunks, chunk)
    iota = jnp.arange(B, dtype=jnp.int32)

    def step(_, ic):
        onehot = (ic[:, None] == iota[None, :]).astype(jnp.float32)
        return None, onehot @ table.astype(jnp.float32)

    _, out = jax.lax.scan(step, None, idx_c)
    return out.reshape(-1)[:N]


def table_lookup(bin_idx, table):
    """table[bin_idx] elementwise; gather on CPU, matmul on TPU."""
    shape = bin_idx.shape
    flat = bin_idx.reshape(-1)
    if jax.default_backend() == "tpu":
        out = _table_lookup_matmul(flat, table)
    else:
        out = table[flat]
    return out.reshape(shape)


@jax.jit
def sign_lookup(bin_idx, table):
    """(table[bin_idx] >= 0) elementwise, gather-free.

    The 256 sign bits pack into 8 uint32 words; per voxel the word is
    picked with 8 fused compares and the bit extracted with shifts — a
    single fused elementwise pass over the volume (no one-hot, no gather).
    """
    num_bins = table.shape[0]
    pad = (-num_bins) % 32
    table = jnp.pad(table, (0, pad), constant_values=-1.0)
    n_words = (num_bins + pad) // 32
    bits = (table >= 0).astype(jnp.uint32)
    words = jnp.sum(
        bits.reshape(n_words, 32)
        << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1,
        dtype=jnp.uint32)

    idx = bin_idx.astype(jnp.int32)
    w = (idx >> 5).astype(jnp.int32)
    sel = jnp.zeros(bin_idx.shape, jnp.uint32)
    for k in range(n_words):
        sel = jnp.where(w == k, words[k], sel)
    bit = (sel >> (idx & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return bit == 1


def masked_histograms_best(bin_idx_flat, masks_flat, num_bins: int = 256):
    """Backend-dispatched histogram: Pallas VMEM kernel on TPU (measured
    ~1.8x the chunked-matmul XLA fallback), scatter-add elsewhere."""
    if jax.default_backend() == "tpu" and masks_flat.shape[0] == 2:
        from .pallas_kernels import masked_histograms_pallas
        return masked_histograms_pallas(bin_idx_flat, masks_flat, num_bins)
    return masked_histograms(bin_idx_flat, masks_flat, num_bins)


def masked_histogram_one(bin_idx_flat, mask_flat, num_bins: int = 256):
    """Single-mask histogram (Pallas on TPU, scatter elsewhere)."""
    if jax.default_backend() == "tpu":
        from .pallas_kernels import masked_histogram1_pallas
        return masked_histogram1_pallas(bin_idx_flat, mask_flat, num_bins)
    return _masked_histograms_scatter(bin_idx_flat, mask_flat[None],
                                      num_bins)[0]
