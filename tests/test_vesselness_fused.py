"""Fused Frangi response kernel: parity with the XLA apply path on CPU
interpret mode (same stencils, same edge-replication semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arterynetwork_tpu.ops.vesselness import (_hessian_from_smoothed,
                                              _response_from_hessian,
                                              _smooth)
from arterynetwork_tpu.ops.vesselness_fused import frangi_response_fused


def _smoothed(shape, sigma, seed=0):
    rng = np.random.default_rng(seed)
    vol = rng.normal(0.1, 0.05, shape).astype(np.float32)
    zc, yc = shape[0] // 2, shape[1] // 2
    vol[zc - 1:zc + 2, yc - 1:yc + 2, 4:shape[2] - 4] += 1.0
    return _smooth(jnp.asarray(vol), sigma)


def _xla_response(sm, sigma, g, alpha=0.5, beta=0.5, bright=True):
    hs = _hessian_from_smoothed(sm, sigma)
    return _response_from_hessian(hs, alpha, beta, g, bright)


@pytest.mark.parametrize("shape,tile", [((10, 24, 40), (8, 24)),
                                        ((9, 20, 33), (4, 8))])
def test_full_volume_parity(shape, tile):
    sigma, g = 1.5, 0.7
    sm = _smoothed(shape, sigma)
    ref = np.asarray(_xla_response(sm, sigma, g))
    out = np.asarray(frangi_response_fused(sm, sigma, g, tile=tile,
                                           interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_interior_range_uses_real_halos():
    """With z_lo/z_hi inside the array, the fused kernel's halo rows are
    the real neighboring rows — output equals the full-frame response's
    slice (the chunked path's semantics)."""
    sigma, g = 2.0, 0.5
    sm = _smoothed((20, 16, 33), sigma, seed=1)
    ref = np.asarray(_xla_response(sm, sigma, g))
    out = np.asarray(frangi_response_fused(sm, sigma, g, z_lo=5, z_hi=17,
                                           tile=(4, 8), interpret=True))
    np.testing.assert_allclose(out, ref[5:17], rtol=1e-4, atol=1e-5)


def test_dark_mode_and_traced_gamma():
    sigma = 1.0
    sm = _smoothed((8, 16, 24), sigma, seed=2)
    g = jnp.float32(0.9)  # traced scalar, as produced by the S-max pass
    ref = np.asarray(_xla_response(sm, sigma, g, bright=False))
    out = np.asarray(frangi_response_fused(sm, sigma, g, bright=False,
                                           tile=(8, 16), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_chunked_fused_response_matches_xla_path():
    """frangi_vesselness_chunked(fused_response=True) reproduces the XLA
    apply path (the fused workers run in interpret mode off-TPU)."""
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness_chunked

    rng = np.random.default_rng(3)
    vol = rng.normal(0.1, 0.05, (40, 24, 33)).astype(np.float32)
    vol[18:22, 10:13, 4:29] += 1.0
    a = np.asarray(frangi_vesselness_chunked(vol, sigmas=(1.0, 2.0),
                                             chunk_z=16))
    b = np.asarray(frangi_vesselness_chunked(vol, sigmas=(1.0, 2.0),
                                             chunk_z=16,
                                             fused_response=True))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_streamed_fused_response_matches_xla_path():
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness_streamed

    rng = np.random.default_rng(4)
    vol = rng.normal(0.1, 0.05, (40, 24, 33)).astype(np.float32)
    vol[18:22, 10:13, 4:29] += 1.0
    a, _, _ = frangi_vesselness_streamed(vol, sigmas=(1.0, 2.0), bits=16)
    b, _, _ = frangi_vesselness_streamed(vol, sigmas=(1.0, 2.0), bits=16,
                                         fused_response=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)


def test_unsupported_lane_extent_falls_back_cleanly():
    """Huge x extents (no tile fits VMEM) are reported unsupported, the
    kernel wrapper refuses loudly, and the chunked driver silently keeps
    the XLA path instead of attempting an over-budget compile."""
    import pytest as _pytest

    from arterynetwork_tpu.ops.vesselness_fused import (
        _pick_tile, frangi_response_fused, fused_response_supported)

    assert fused_response_supported(512)
    assert not fused_response_supported(4096)
    assert _pick_tile(4224) is None
    sm = jnp.zeros((4, 8, 4096), jnp.float32)
    with _pytest.raises(ValueError, match="fused_response_supported"):
        frangi_response_fused(sm, 1.0, 0.5, interpret=True)
