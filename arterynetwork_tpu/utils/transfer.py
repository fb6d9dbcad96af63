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


def mask_to_host(mask_device) -> np.ndarray:
    """bool device array -> bool numpy array via packed bits."""
    m = mask_device.reshape(-1)
    pad = (-m.shape[0]) % 8
    m = jnp.pad(m.astype(jnp.uint8), (0, pad))
    bits = m.reshape(-1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = jnp.sum(bits * weights[None, :], axis=1, dtype=jnp.uint8)
    host = np.unpackbits(np.asarray(packed))
    n = int(np.prod(mask_device.shape))
    return host[:n].reshape(mask_device.shape).astype(bool)


def f16_to_host(x_device) -> np.ndarray:
    """float device array -> f32 numpy via an f16 wire format."""
    return np.asarray(jnp.asarray(x_device, jnp.float16)).astype(np.float32)
