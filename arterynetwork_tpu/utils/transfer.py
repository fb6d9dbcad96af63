"""Device<->host transfer helpers.

The tunneled TPU in this environment moves ~33 MB/s, so large-array
transfers dominate pipeline stages unless compressed: booleans cross as
packed bits (8x), distance fields as f16 (2x, plenty for voxel radii).
On a directly-attached TPU these are still free wins.
"""

from __future__ import annotations

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
