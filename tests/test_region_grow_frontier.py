"""Frontier-tile Pallas region grower: exact parity with the full-grid
kernel (per-iteration, not just at the fixed point) on CPU interpret
mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arterynetwork_tpu.ops.region_grow import region_grow
from arterynetwork_tpu.ops.region_grow_frontier import region_grow_frontier


def _bar_phantom(shape=(24, 40, 48), seed=0):
    rng = np.random.default_rng(seed)
    vol = rng.normal(0.1, 0.03, shape).astype(np.float32)
    vol[10:14, 10:14, 8:40] += 0.8
    seed_mask = np.zeros(shape, bool)
    seed_mask[11:13, 11:13, 20:24] = True
    return vol, seed_mask


def _run_both(vol, seed, **kw):
    full = region_grow(jnp.asarray(vol), jnp.asarray(seed), **kw)
    front = region_grow_frontier(jnp.asarray(vol), jnp.asarray(seed),
                                 tile=(8, 16), k_max=16, interpret=True,
                                 **kw)
    return full, front


def test_fixed_point_parity():
    vol, seed = _bar_phantom()
    full, front = _run_both(vol, seed, max_segment_size=100000,
                            iter_max=100)
    assert int(front.stop_reason) == 0  # converged
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))
    assert int(full.iterations) == int(front.iterations)
    assert int(full.segmented_count) == int(front.segmented_count)


@pytest.mark.parametrize("iters", [1, 3])
def test_per_iteration_trajectory_parity(iters):
    """Jacobi semantics: identical segmentation after every sweep (the
    double-buffered halo reads prevent same-launch Gauss-Seidel
    coupling between neighboring tiles)."""
    vol, seed = _bar_phantom(seed=3)
    full, front = _run_both(vol, seed, max_segment_size=100000,
                            iter_max=iters)
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))


def test_size_cap_returns_preupdate_state():
    vol, seed = _bar_phantom(seed=1)
    full, front = _run_both(vol, seed, max_segment_size=64, iter_max=100)
    assert int(front.stop_reason) == 1
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))


def test_non_divisible_dims():
    """Volume dims not divisible by the tile: padded tiles never flip."""
    vol, seed = _bar_phantom(shape=(21, 37, 45), seed=2)
    full, front = _run_both(vol, seed, max_segment_size=100000,
                            iter_max=60)
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))


def test_tile_batch_non_divisor_parity():
    """nb that does not divide the active-tile count: the final step's
    invalid trailing slots are masked out of flips/flags/hist."""
    vol, seed = _bar_phantom(seed=5)
    full = region_grow(jnp.asarray(vol), jnp.asarray(seed),
                       max_segment_size=100000, iter_max=100)
    front = region_grow_frontier(jnp.asarray(vol), jnp.asarray(seed),
                                 tile=(8, 16), k_max=16, nb=3,
                                 interpret=True,
                                 max_segment_size=100000, iter_max=100)
    assert int(front.stop_reason) == 0
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))
    assert int(full.iterations) == int(front.iterations)


def test_k_max_overflow_still_converges():
    """More active tiles than k_max: unprocessed tiles stay active and
    get their flips on later sweeps; the fixed point is unchanged."""
    vol, seed = _bar_phantom(seed=4)
    full = region_grow(jnp.asarray(vol), jnp.asarray(seed),
                       max_segment_size=100000, iter_max=100)
    front = region_grow_frontier(jnp.asarray(vol), jnp.asarray(seed),
                                 tile=(8, 16), k_max=2, interpret=True,
                                 max_segment_size=100000, iter_max=100)
    assert int(front.stop_reason) == 0
    np.testing.assert_array_equal(np.asarray(full.segmented_map),
                                  np.asarray(front.segmented_map))
