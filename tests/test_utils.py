"""Utility module tests (profiling, debug gates, transfer helpers)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arterynetwork_tpu.utils import (
    StageTimer,
    assert_solution_valid,
    check_finite,
)
from arterynetwork_tpu.utils.transfer import f16_to_host, mask_to_host


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["seconds"] >= 0


def test_check_finite_raises_with_context():
    bad = np.array([1.0, np.nan, 2.0])
    with pytest.raises(FloatingPointError, match="pressure"):
        check_finite(bad, "pressure")
    check_finite(np.ones(3), "ok")


def test_assert_solution_valid():
    from arterynetwork_tpu.flow.solvers import FlowSolution

    good = FlowSolution(pressure=jnp.ones(4), flow=jnp.ones(3),
                        velocity=jnp.ones(3),
                        residual_norm=jnp.asarray(1e-12),
                        iterations=jnp.asarray(3))
    assert_solution_valid(good)
    bad = good._replace(residual_norm=jnp.asarray(1e-3))
    with pytest.raises(ValueError, match="did not converge"):
        assert_solution_valid(bad)


def test_transfer_helpers_round_trip():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((13, 7, 9)) > 0.5)
    np.testing.assert_array_equal(mask_to_host(mask), np.asarray(mask))
    x = jnp.asarray(rng.random((5, 6)).astype(np.float32) * 30)
    back = f16_to_host(x)
    np.testing.assert_allclose(back, np.asarray(x), rtol=1e-3)


def test_sparse_mask_download_matches_dense():
    from arterynetwork_tpu.utils.transfer import (pack_mask,
                                                  sparse_mask_to_host_packed)

    rng = np.random.default_rng(1)
    # block-sparse mask, shape not a multiple of the block dims
    m = np.zeros((21, 37, 48), bool)
    m[3:6, 10:14, 8:24] = True
    m[17:20, 30:36, 40:48] = rng.random((3, 6, 8)) > 0.4
    dm = jnp.asarray(m)
    np.testing.assert_array_equal(sparse_mask_to_host_packed(dm),
                                  np.asarray(pack_mask(dm)))
    # second call reuses the zeroed scratch: result must be identical
    np.testing.assert_array_equal(sparse_mask_to_host_packed(dm),
                                  np.asarray(pack_mask(dm)))
    # dense fallback paths: X % 8 != 0, and occupancy above the cutoff
    modd = jnp.asarray(m[:, :, :45])
    np.testing.assert_array_equal(sparse_mask_to_host_packed(modd),
                                  np.asarray(pack_mask(modd)))
    full = jnp.asarray(rng.random((12, 9, 16)) > 0.3)
    np.testing.assert_array_equal(sparse_mask_to_host_packed(full),
                                  np.asarray(pack_mask(full)))
    # exact block-multiple shape: the crop is the whole scratch buffer,
    # so consecutive results must be freshly-owned copies, not views of
    # scratch memory the next call overwrites
    a = np.zeros((16, 16, 16), bool)
    a[2:5, 3:6, 4:9] = True
    b = np.zeros((16, 16, 16), bool)
    b[9:12, 10:13, 2:7] = True
    da, db = jnp.asarray(a), jnp.asarray(b)
    ra = sparse_mask_to_host_packed(da)
    rb = sparse_mask_to_host_packed(db)
    np.testing.assert_array_equal(ra, np.asarray(pack_mask(da)))
    np.testing.assert_array_equal(rb, np.asarray(pack_mask(db)))


def test_sparse_masks_batched_matches_singles():
    """sparse_masks_to_host_packed == per-mask calls, including mixed
    dense fallbacks (X % 8 and high occupancy) in the same batch, and
    masks of different shapes (the weak + 2x-pooled-strong pair)."""
    from arterynetwork_tpu.utils.transfer import (
        pack_mask, sparse_mask_to_host_packed, sparse_masks_to_host_packed)

    rng = np.random.default_rng(5)
    weak = np.zeros((24, 40, 48), bool)
    weak[4:8, 10:20, 8:32] = rng.random((4, 10, 24)) > 0.3
    strong = np.zeros((12, 20, 24), bool)
    strong[2:4, 5:10, 4:16] = True
    odd = np.zeros((10, 12, 20), bool)   # X % 8 != 0 -> dense
    odd[3:5, 4:8, 2:9] = True
    full = rng.random((12, 9, 16)) > 0.3  # occupancy > cutoff -> dense
    dmasks = [jnp.asarray(m) for m in (weak, strong, odd, full)]
    batched = sparse_masks_to_host_packed(dmasks)
    for dm, got in zip(dmasks, batched):
        np.testing.assert_array_equal(got, sparse_mask_to_host_packed(dm))
        np.testing.assert_array_equal(got, np.asarray(pack_mask(dm)))
