"""Device<->host transfer helpers.

The tunneled TPU in this environment moves ~33 MB/s, so large-array
transfers dominate pipeline stages unless compressed: booleans cross as
packed bits (8x), distance fields as f16 (2x, plenty for voxel radii).
On a directly-attached TPU these are still free wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack_bits(m):
    m = m.reshape(-1)
    pad = (-m.shape[0]) % 8
    m = jnp.pad(m.astype(jnp.uint8), (0, pad))
    bits = m.reshape(-1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits * weights[None, :], axis=1, dtype=jnp.uint8)


def pack_mask(mask_device):
    """bool device array -> flat packed-bit uint8 device array (MSB-first
    np.packbits order — the wire format the packed native consumers read,
    e.g. ops/native.hysteresis_components_ds2_packed_native)."""
    return _pack_bits(mask_device)


def mask_to_host(mask_device) -> np.ndarray:
    """bool device array -> bool numpy array via packed bits."""
    host = np.unpackbits(np.asarray(pack_mask(mask_device)))
    n = int(np.prod(mask_device.shape))
    return host[:n].reshape(mask_device.shape).astype(bool)


@functools.partial(jax.jit, static_argnames=("bz", "by", "bxb"))
def _pack_blockify(mask, bz, by, bxb):
    """Pack a bool volume to x-octet bytes, tile into (bz, by, bxb)-byte
    blocks, and compute per-block occupancy.

    Returns ``(blocks (Nb, bz*by*bxb) u8, occ_packed u8)``.  Requires
    X % 8 == 0 so the per-row byte layout equals flat np.packbits order.
    """
    Z, Y, X = mask.shape
    bits = mask.astype(jnp.uint8).reshape(Z, Y, X // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = jnp.sum(bits * weights, axis=3, dtype=jnp.uint8)
    XB = X // 8
    zp, yp, xp = (-Z) % bz, (-Y) % by, (-XB) % bxb
    packed = jnp.pad(packed, ((0, zp), (0, yp), (0, xp)))
    Zb, Yb, Xb = (Z + zp) // bz, (Y + yp) // by, (XB + xp) // bxb
    blocks = packed.reshape(Zb, bz, Yb, by, Xb, bxb) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(Zb * Yb * Xb, bz * by * bxb)
    occ = jnp.any(blocks != 0, axis=1)
    return blocks, _pack_bits(occ)


@jax.jit
def _extract_blocks(blocks, idx):
    """Rows of ``blocks`` at ``idx`` — a lax.scan of dynamic slices, NOT
    a gather (per-element gathers run at ~8 us/element on this TPU)."""
    def body(_, i):
        return 0, jax.lax.dynamic_slice_in_dim(blocks, i, 1, axis=0)[0]
    _, out = jax.lax.scan(body, 0, idx)
    return out


_SPARSE_SCRATCH = {}


def _sparse_reassemble(idx, payload, shape, block):
    """Scatter occupied block payloads back into the dense packed-byte
    volume on the host (cheap: few MB of memcpy through a reused
    scratch) and return the flat packed-bit array."""
    Z, Y, X = shape
    bz, by, bxb = block
    XB = X // 8
    Zb, Yb, Xb = -(-Z // bz), -(-Y // by), -(-XB // bxb)
    Nb = Zb * Yb * Xb
    B = bz * by * bxb
    key = (Zb, Yb, Xb, bz, by, bxb)
    buf = _SPARSE_SCRATCH.get(key)
    if buf is None or buf[0].shape[0] != Nb:
        buf = (np.zeros((Nb, B), np.uint8),
               np.empty((Zb * bz, Yb * by, Xb * bxb), np.uint8))
        _SPARSE_SCRATCH[key] = buf
    flatb, vol = buf
    flatb[idx] = payload[:idx.size]
    np.copyto(vol, flatb.reshape(Zb, Yb, Xb, bz, by, bxb)
              .transpose(0, 3, 1, 4, 2, 5).reshape(vol.shape))
    flatb[idx] = 0  # keep the scratch all-zero for the next call
    out = np.ascontiguousarray(vol[:Z, :Y, :XB])
    if np.shares_memory(out, vol):
        # unpadded shapes make the crop the whole scratch buffer — the
        # caller owns the result, so never hand out scratch memory that
        # the next call would overwrite
        out = out.copy()
    return out.reshape(-1)


def sparse_masks_to_host_packed(masks, block=(8, 8, 2),
                                max_occupancy=0.5):
    """Batched ``sparse_mask_to_host_packed``: ONE occupancy roundtrip
    and ONE payload roundtrip for all masks.

    Every device->host sync on the tunneled backend costs ~25 ms of
    latency on top of the bytes; the weak+strong mask pair of the
    segmentation stage pays it twice instead of four times by
    concatenating the occupancy bitmaps (and then the payloads) into a
    single download each.  Per-mask results are identical to the
    single-mask calls.
    """
    bz, by, bxb = block
    staged = []
    occ_parts = []
    for m in masks:
        Z, Y, X = m.shape
        if X % 8:
            staged.append(None)  # dense fallback, resolved below
            continue
        blocks, occp = _pack_blockify(m, bz, by, bxb)
        staged.append((blocks, int(np.prod(occp.shape))))
        occ_parts.append(occp)
    occ_all = (np.asarray(jnp.concatenate(occ_parts))
               if occ_parts else np.zeros(0, np.uint8))  # sync 1
    pos = 0
    plans = []
    payload_parts = []
    for m, st in zip(masks, staged):
        if st is None:
            plans.append(("dense", pack_mask(m)))
            continue
        blocks, occ_len = st
        Nb = blocks.shape[0]
        occ = np.unpackbits(occ_all[pos:pos + occ_len])[:Nb] != 0
        pos += occ_len
        idx = np.flatnonzero(occ)
        if idx.size > max_occupancy * Nb:
            plans.append(("dense", pack_mask(m)))
            continue
        cap = 1 << max(9, int(np.ceil(np.log2(max(idx.size, 1)))))
        cap = min(cap, Nb)
        idxp = np.zeros(cap, np.int32)
        idxp[:idx.size] = idx
        payload_parts.append(_extract_blocks(blocks, jnp.asarray(idxp)))
        plans.append(("sparse", (idx, cap, m.shape)))
    payload_all = (np.asarray(jnp.concatenate(payload_parts, axis=0))
                   if payload_parts else None)  # sync 2
    pos = 0
    outs = []
    for kind, data in plans:
        if kind == "dense":
            outs.append(np.asarray(data))
            continue
        idx, cap, shape = data
        payload = payload_all[pos:pos + cap]
        pos += cap
        outs.append(_sparse_reassemble(idx, payload, shape, block))
    return outs


def sparse_mask_to_host_packed(mask_device, block=(8, 8, 2),
                               max_occupancy=0.5) -> np.ndarray:
    """bool device array -> flat packed-bit uint8 host array (np.packbits
    order), moving only the occupied blocks over the wire.

    Vessel masks are block-sparse (~7% of 8x8x16-voxel blocks occupied at
    typical weak-mask densities), so downloading a per-block occupancy
    bitmap (1 bit/block) plus the occupied 128-byte block payloads cuts
    the mask wire ~8-10x vs the dense packed download.  Extraction is a
    scan of dynamic slices (no gather).  Falls back to the dense path
    when X % 8 != 0 or measured occupancy exceeds ``max_occupancy``.
    Payload slots are bucketed to powers of two to bound recompiles.
    """
    return sparse_masks_to_host_packed([mask_device], block=block,
                                       max_occupancy=max_occupancy)[0]


def f16_to_host(x_device) -> np.ndarray:
    """float device array -> f32 numpy via an f16 wire format."""
    return np.asarray(jnp.asarray(x_device, jnp.float16)).astype(np.float32)


def upload_quantized(x_host, bits: int = 12):
    """Upload a float volume as packed 12-bit (or 8-bit) fixed point and
    dequantize on device.  Returns an f32 device array.

    Raw MRA data is ~12-bit integers, so the 12-bit wire format carries
    the full acquisition precision in 1.5 bytes/voxel — 25% less wire
    than float16 at equal-or-better absolute precision (f16 has an
    11-bit mantissa).  8-bit quantization noise (0.2% of range) sits an
    order of magnitude below MRA image noise; use it when the link is
    the bottleneck and inputs are noisy images.
    """
    x = np.asarray(x_host)
    mn = float(x.min())
    mx = float(x.max())
    scale = (mx - mn) or 1.0
    shape = x.shape
    if bits == 8:
        q = np.round((x.reshape(-1) - mn) * (255.0 / scale)).astype(np.uint8)
        dq = jnp.asarray(q)
        out = dq.astype(jnp.float32) * (scale / 255.0) + mn
        return out.reshape(shape)
    if bits != 12:
        raise ValueError("bits must be 8 or 12")
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 2
    q = np.round((np.concatenate([flat, flat[-1:].repeat(pad)]) - mn)
                 * (4095.0 / scale)).astype(np.uint16)
    q0, q1 = q[0::2], q[1::2]
    packed = np.empty((q0.shape[0], 3), np.uint8)
    packed[:, 0] = q0 >> 4
    packed[:, 1] = ((q0 & 0xF) << 4) | (q1 >> 8)
    packed[:, 2] = q1 & 0xFF
    dp = jnp.asarray(packed)

    b0 = dp[:, 0].astype(jnp.int32)
    b1 = dp[:, 1].astype(jnp.int32)
    b2 = dp[:, 2].astype(jnp.int32)
    v0 = (b0 << 4) | (b1 >> 4)
    v1 = ((b1 & 0xF) << 8) | b2
    vals = jnp.stack([v0, v1], axis=1).reshape(-1)[:n]
    return (vals.astype(jnp.float32) * (scale / 4095.0) + mn).reshape(shape)
