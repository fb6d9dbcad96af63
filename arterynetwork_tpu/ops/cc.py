"""Connected-component labeling as iterated label propagation.

Replaces ``skimage.measure.label`` (used by the reference to drop small
disconnected blobs, generateVesselVolume.py:107-136, and to split the
vessel mask per component before skeletonization, skeletonization.py:108).

Algorithm: every foreground voxel starts with its flat index as a label;
each round takes the min label over the 26-neighborhood (restricted to
foreground), then pointer-jumps ``label <- label[label]`` a few times
(path compression).  The combination converges in O(log N) rounds for
typical vascular geometry instead of O(diameter) for plain propagation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _axis_min3(x, axis, pad_value):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, constant_values=pad_value)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    return jnp.minimum(jnp.minimum(lo, mid), hi)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_rounds"))
def connected_components(mask, connectivity: int = 3, max_rounds: int = 64):
    """Label 26-connected (connectivity=3) or 6-connected (connectivity=1)
    components.  Returns int32 labels: 0 = background, components numbered
    by the flat index of their smallest voxel + 1 (relabel to compact ids
    with ``compact_labels``).

    ``connectivity`` follows skimage: 1 = faces only, 2 = faces+edges,
    3 = faces+edges+corners.  (2 is approximated as 3 here; the reference
    always uses maxHop=3.)
    """
    fg = jnp.asarray(mask) != 0
    shape = fg.shape
    n = int(np.prod(shape))
    idx = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n)
    labels = jnp.where(fg, idx, big)

    def propagate(lab):
        if connectivity == 1:
            m = lab
            best = lab
            for axis in range(lab.ndim):
                best = jnp.minimum(best, _axis_min3(m, axis, big))
        else:
            best = lab
            for axis in range(lab.ndim):
                best = _axis_min3(best, axis, big)
        return jnp.where(fg, jnp.minimum(lab, best), big)

    def jump(lab):
        flat = lab.reshape(-1)
        padded = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        return padded[jnp.minimum(flat, n)].reshape(shape)

    def body(state):
        lab, _, it = state
        new = propagate(lab)
        new = jump(jump(new))
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_rounds)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, labels + 1, 0)


def compact_labels(labels):
    """Host-side: renumber labels to 1..K and return (labels, sizes).

    sizes is ``[(label, voxel_count), ...]`` like the reference's
    ``labelResult`` (generateVesselVolume.py:125-132, background included
    as label 0).
    """
    labels = np.asarray(labels)
    uniq, inv = np.unique(labels, return_inverse=True)
    compact = inv.reshape(labels.shape).astype(np.int32)
    if uniq[0] != 0:
        compact = compact + 1  # no background present
    counts = np.bincount(compact.ravel())
    label_result = list(zip(np.arange(len(counts)), counts))
    return compact, label_result


def label_volume(volume, min_size: int = 1, connectivity: int = 3,
                 backend: str = "auto"):
    """API parity with the reference ``labelVolume``
    (generateVesselVolume.py:107-136 / skeletonization.py:67-95): label the
    volume, return (labeled, labelResult) with components smaller than
    ``min_size`` excluded from labelResult.

    backend="host" uses the native C++ flood fill (ops/native.py; the
    pointer-jumping device kernel relies on gathers, which run ~8
    us/element on this TPU — CC is a host-side op at MRA scale, exactly
    as in the reference); "device" forces the JAX kernel; "auto" picks
    host on TPU.
    """
    import jax

    if backend == "auto":
        backend = "host" if jax.default_backend() == "tpu" else "device"
    if backend == "host":
        if connectivity >= 2:
            from .native import label_components_native
            labeled, _ = label_components_native(volume)
        else:
            from scipy import ndimage
            structure = ndimage.generate_binary_structure(3, 1)
            labeled, _ = ndimage.label(np.asarray(volume) != 0,
                                       structure=structure)
            labeled = labeled.astype(np.int32)
        counts = np.bincount(labeled.ravel())
        label_result = [(int(l), int(c)) for l, c in enumerate(counts)]
    else:
        raw = connected_components(volume, connectivity=connectivity)
        labeled, label_result = compact_labels(raw)
    filtered = [(int(l), int(s)) for l, s in label_result if s >= min_size]
    return labeled, filtered


def drop_small_components(volume, threshold: int = 150, connectivity: int = 3):
    """Zero out connected components with <= threshold voxels (reference
    main(), generateVesselVolume.py:195-199)."""
    vol = np.asarray(volume)
    if (connectivity >= 2 and vol.dtype in (np.bool_, np.uint8)
            and vol.max() <= 1):
        # binary volume: single fused native pass (label + sizes + zero)
        from .native import drop_small_components_native
        return drop_small_components_native(vol, threshold).astype(vol.dtype)
    labeled, label_result = label_volume(vol, connectivity=connectivity)
    sizes = np.zeros(max(l for l, _ in label_result) + 1, np.int64)
    for lab, size in label_result:
        sizes[lab] = size
    keep = sizes > threshold
    keep[0] = False
    out = vol.copy()
    out[~keep[labeled]] = 0
    return out
