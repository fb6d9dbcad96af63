"""Frangi vesselness filter tests."""

import numpy as np

from arterynetwork_tpu.ops.vesselness import (
    frangi_vesselness,
    symmetric_eigvals_3x3,
)


def test_eigenvalues_match_numpy():
    rng = np.random.default_rng(0)
    n = 2000
    A = rng.normal(size=(n, 3, 3))
    A = (A + A.transpose(0, 2, 1)) / 2
    ours = symmetric_eigvals_3x3(
        A[:, 0, 0], A[:, 1, 1], A[:, 2, 2],
        A[:, 0, 1], A[:, 0, 2], A[:, 1, 2])
    ours = np.stack([np.asarray(e) for e in ours], axis=1)
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_eigenvalues_degenerate():
    # isotropic and rank-deficient cases
    cases = np.array([
        [2.0, 2.0, 2.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1.0, 1.0, 5.0, 0.0, 0.0, 0.0],
    ])
    ours = symmetric_eigvals_3x3(*[cases[:, i] for i in range(6)])
    ours = np.stack([np.asarray(e) for e in ours], axis=1)
    expected = np.array([[2, 2, 2], [0, 0, 0], [1, 1, 5]], float)
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_tube_lights_up():
    """Vesselness is high inside a bright tube, low in flat background."""
    shape = (40, 40, 60)
    x, y, z = np.mgrid[: shape[0], : shape[1], : shape[2]]
    vol = np.exp(-(((x - 20) ** 2 + (y - 20) ** 2) / (2 * 2.5 ** 2)))
    vol = vol.astype(np.float32)

    v = np.asarray(frangi_vesselness(vol, sigmas=(2.0, 3.0)))
    inside = v[20, 20, 20:40].mean()
    background = v[5, 5, 20:40].mean()
    assert inside > 0.5
    assert background < 0.05
    assert inside > 20 * max(background, 1e-6)


def test_plate_suppressed():
    """A bright plate (sheet) is not a vessel: Rb/Ra discrimination."""
    shape = (40, 40, 40)
    x = np.mgrid[: shape[0], : shape[1], : shape[2]][0]
    plate = np.exp(-((x - 20) ** 2) / (2 * 2.0 ** 2)).astype(np.float32)
    tube_shape = shape
    xx, yy, zz = np.mgrid[: shape[0], : shape[1], : shape[2]]
    tube = np.exp(-(((xx - 20) ** 2 + (yy - 20) ** 2) / (2 * 2.0 ** 2)))

    v_plate = np.asarray(frangi_vesselness(plate, sigmas=(2.0,)))
    v_tube = np.asarray(frangi_vesselness(tube.astype(np.float32),
                                          sigmas=(2.0,)))
    assert v_tube[20, 20, 20] > 3 * v_plate[20, 20, 20]


def test_chunked_matches_unchunked():
    """Halo'd z-slab evaluation is exact (same padding, exact two-pass
    auto gamma) — required for Speck-scale volumes that OOM the
    full-grid temporaries."""
    import numpy as np

    from arterynetwork_tpu.ops.vesselness import (frangi_vesselness,
                                                  frangi_vesselness_chunked)

    rng = np.random.default_rng(0)
    vol = rng.normal(0.1, 0.05, (64, 48, 40)).astype(np.float32)
    vol[20:44, 22:26, 18:22] += 1.0
    full = np.asarray(frangi_vesselness(vol, sigmas=(1.0, 2.0)))
    chunked = np.asarray(frangi_vesselness_chunked(vol, sigmas=(1.0, 2.0),
                                                   chunk_z=16))
    # interior z-rows agree to f32 matmul-blocking rounding (the slab and
    # the full volume contract different-sized banded matrices, which
    # groups the same partial sums differently); the volume-face rows
    # differ more (edge-replicate vs zero-tail differences at the border)
    np.testing.assert_allclose(chunked[1:-1], full[1:-1], atol=1e-5)
    assert np.abs(chunked - full).max() < 0.05
    # explicit gamma path too
    full_g = np.asarray(frangi_vesselness(vol, sigmas=(1.5,), gamma=0.7))
    chunked_g = np.asarray(frangi_vesselness_chunked(
        vol, sigmas=(1.5,), gamma=0.7, chunk_z=24))
    np.testing.assert_allclose(chunked_g[1:-1], full_g[1:-1], atol=1e-5)


def test_chunked_donate_input():
    """donate_input frees a jax.Array input after the padded copy is
    built (numpy inputs are untouched); output is unchanged."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.vesselness import frangi_vesselness_chunked

    rng = np.random.default_rng(5)
    vol = rng.normal(0.1, 0.05, (40, 32, 24)).astype(np.float32)
    vol[10:30, 14:18, 10:14] += 1.0
    ref = np.asarray(frangi_vesselness_chunked(vol, sigmas=(1.5,),
                                               chunk_z=16))
    dvol = jnp.asarray(vol)
    out = np.asarray(frangi_vesselness_chunked(dvol, sigmas=(1.5,),
                                               chunk_z=16,
                                               donate_input=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert dvol.is_deleted()


def test_streamed_matches_chunked_on_quantized_field():
    """frangi_vesselness_streamed == frangi_vesselness_chunked on the
    same dequantized volume (the streamed path only changes how bytes
    reach the device)."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.vesselness import (
        frangi_vesselness_chunked, frangi_vesselness_streamed)

    rng = np.random.default_rng(3)
    raw = rng.normal(100.0, 5.0, (40, 48, 52)).astype(np.float32)
    raw[18:22, 20:24, :] += 60.0

    v_str, t_up, t_comp = frangi_vesselness_streamed(
        raw, sigmas=(1.0, 2.0), chunk_z=16, bits=8)
    assert t_up > 0 and t_comp > 0

    # same u8 quantization, device chunked path.  Scales after the first
    # apply directly from the resident volume, so the z-face halo rows
    # follow the direct path's zero-padding-smoothed semantics;
    # interiors match exactly.
    mn, mx = float(raw.min()), float(raw.max())
    q = np.round((raw - mn) * (255.0 / (mx - mn))).astype(np.uint8)
    deq = jnp.asarray(q).astype(jnp.float32) * ((mx - mn) / 255.0) + mn
    v_chk = frangi_vesselness_chunked(deq, sigmas=(1.0, 2.0), chunk_z=16)
    a, b = np.asarray(v_str), np.asarray(v_chk)
    halo = 7  # ceil(3 * max sigma) + 1
    np.testing.assert_allclose(a[halo:-halo], b[halo:-halo], atol=1e-5)
    np.testing.assert_allclose(a, b, atol=0.1)


def test_streamed_bq4_matches_chunked_on_quantized_field():
    """bits=4 (row-adaptive nibble wire) == chunked path on the same
    dequantized field; also pins the native pack == numpy pack."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.vesselness import (
        frangi_vesselness_chunked, frangi_vesselness_streamed)

    rng = np.random.default_rng(7)
    raw = rng.normal(100.0, 5.0, (40, 48, 52)).astype(np.float32)
    raw[18:22, 20:24, :] += 60.0

    v_str, t_up, t_comp = frangi_vesselness_streamed(
        raw, sigmas=(1.0, 2.0), chunk_z=16, bits=4)

    # same row-adaptive dequantization, device chunked path
    rmn = raw.min(axis=2)
    rg = raw.max(axis=2) - rmn
    inv = np.where(rg > 0, 15.0 / np.maximum(rg, 1e-30), 0.0)
    q = np.round((raw - rmn[..., None]) * inv[..., None])
    deq = q * (rg / 15.0)[..., None] + rmn[..., None]
    v_chk = frangi_vesselness_chunked(jnp.asarray(deq.astype(np.float32)),
                                      sigmas=(1.0, 2.0), chunk_z=16)
    a, b = np.asarray(v_str), np.asarray(v_chk)
    halo = 7  # interior exact; z-face rows follow the direct-apply path
    np.testing.assert_allclose(a[halo:-halo], b[halo:-halo], atol=1e-5)
    np.testing.assert_allclose(a, b, atol=0.1)


def test_bq4_native_pack_matches_numpy():
    from arterynetwork_tpu.ops.native import bq4_pack_native

    rng = np.random.default_rng(11)
    sl = rng.normal(100.0, 4.0, (8, 24, 64)).astype(np.float32)
    sl[2, 3, :] = 7.25  # constant row: scale 0, exact min
    packed, rsc, rmn = bq4_pack_native(sl)
    ref_mn = sl.min(axis=2)
    ref_rg = sl.max(axis=2) - ref_mn
    inv = np.where(ref_rg > 0, 15.0 / np.maximum(ref_rg, 1e-30), 0.0)
    q = np.round((sl - ref_mn[..., None]) * inv[..., None]).astype(np.uint8)
    assert np.array_equal(packed, (q[..., 0::2] << 4) | q[..., 1::2])
    assert np.array_equal(rsc, (ref_rg / 15.0).astype(np.float32))
    assert np.array_equal(rmn, ref_mn)


def test_bq_alignment_degrades_to_next_finer_format():
    """x=170 cannot pack 4- or 8-voxel groups: requesting bq2 must land
    on bq4 (the next finer format that fits), not on u8."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.vesselness import (
        frangi_vesselness_chunked, frangi_vesselness_streamed)

    rng = np.random.default_rng(21)
    raw = rng.normal(100.0, 5.0, (24, 32, 170)).astype(np.float32)
    raw[10:14, 14:18, :] += 60.0
    v2, _, _ = frangi_vesselness_streamed(raw, sigmas=(1.5,), chunk_z=12,
                                          bits=2)
    v4, _, _ = frangi_vesselness_streamed(raw, sigmas=(1.5,), chunk_z=12,
                                          bits=4)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v4))
    # and NOT the u8 result (different quantization -> different field)
    v8, _, _ = frangi_vesselness_streamed(raw, sigmas=(1.5,), chunk_z=12,
                                          bits=8)
    assert not np.array_equal(np.asarray(v2), np.asarray(v8))


def test_bq_low_bit_wire_round_trips():
    """bq3/bq2 native pack -> device unpack recovers the row-quantized
    field exactly (pack and unpack are exact inverses up to the
    quantization grid)."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.native import bq_pack_native
    from arterynetwork_tpu.ops.vesselness import (_upload_slab_bq2,
                                                  _upload_slab_bq3)

    rng = np.random.default_rng(13)
    sl = rng.normal(50.0, 10.0, (6, 16, 64)).astype(np.float32)
    sl[1, 2, :] = -3.5  # constant row
    for bits, up in ((3, _upload_slab_bq3), (2, _upload_slab_bq2)):
        qmax = (1 << bits) - 1
        packed, rsc, rmn = bq_pack_native(sl, bits)
        ref_mn = sl.min(axis=2)
        ref_rg = sl.max(axis=2) - ref_mn
        inv = np.where(ref_rg > 0, qmax / np.maximum(ref_rg, 1e-30), 0.0)
        q = np.round((sl - ref_mn[..., None]) * inv[..., None])
        expect = (q * (ref_rg / qmax)[..., None] + ref_mn[..., None])
        volp = jnp.zeros_like(jnp.asarray(sl))
        out = np.asarray(up(volp, jnp.asarray(packed), jnp.asarray(rsc),
                            jnp.asarray(rmn), 0))
        np.testing.assert_allclose(out, expect.astype(np.float32),
                                   atol=1e-5)


def test_blocked_banded_matches_dense():
    """The block-banded contraction (128-row blocks x 256-wide windows)
    is the same linear operator as the dense (n, n) banded matmul, for
    both the Gaussian taps and the edge-replicated difference stencils,
    on divisible and non-divisible axis lengths."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops import vesselness as V

    rng = np.random.default_rng(7)
    for shape in ((6, 512, 384), (5, 450, 410)):
        vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cases = []
        for sigma in (1.0, 3.0):
            taps = tuple(np.asarray(
                V._gaussian_kernel(sigma, 0)).tolist())
            cases.append((("conv", taps),
                          V._banded_conv_matrix))
        cases += [(("diff", 1), None), (("diff", 2), None)]
        for key, _ in cases:
            for axis in (1, 2):
                n = vol.shape[axis]
                B = (V._diff_matrix(n, key[1]) if key[0] == "diff"
                     else V._banded_conv_matrix(key[1], n))
                dense = jnp.einsum(V._AXIS_EINSUM[axis],
                                   jnp.asarray(B), vol)
                blk = V._apply_blocked(
                    vol, V._block_banded_matrix(key, n), axis, n)
                np.testing.assert_allclose(np.asarray(dense),
                                           np.asarray(blk),
                                           rtol=1e-5, atol=1e-6)


def test_conv_axis_dispatches_blocked_above_threshold():
    """_conv_axis output is unchanged across the dense/blocked dispatch
    boundary (same taps, axis lengths straddling _BLOCKED_MIN_N)."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops import vesselness as V

    rng = np.random.default_rng(8)
    big = jnp.asarray(rng.normal(size=(4, 400, 400)).astype(np.float32))
    k = V._gaussian_kernel(2.0, 0)
    out = np.asarray(V._conv_axis(big, k, 1))
    # reference: straight dense contraction
    B = V._banded_conv_matrix(tuple(np.asarray(k).tolist()), 400)
    ref = np.asarray(jnp.einsum(V._AXIS_EINSUM[1], jnp.asarray(B), big))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_upload_skip_sparse_matches_dense_on_kept_rows():
    """Occupancy-skipped upload (_upload_slab_bq_sparse): kept row-chunks
    decode bit-identically to the dense bq path; rows in skipped chunks
    decode to their row midpoint."""
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.native import bq_pack_native
    from arterynetwork_tpu.ops import vesselness as V

    rng = np.random.default_rng(17)
    # background noise rows (range ~12) + a few bright vessel rows
    sl = rng.normal(100.0, 2.0, (8, 24, 64)).astype(np.float32)
    sl[3, 5, 20:30] += 120.0
    sl[6, 17, :10] += 120.0
    for bits in (4, 3, 2):
        packed, rsc, rmn = bq_pack_native(sl, bits)
        sp = V._compact_bq_slab(packed, rsc, rmn, bits)
        assert sp is not None, "skip should engage on this slab"
        pay, idx, rsc2, rmn2, nch = sp
        # it actually skipped most chunks
        n_kept = int((idx < nch).sum())
        assert n_kept < nch // 2
        volp = jnp.zeros_like(jnp.asarray(sl))
        out = np.asarray(V._upload_slab_bq_sparse(
            volp, jnp.asarray(pay), jnp.asarray(idx), jnp.asarray(rsc2),
            jnp.asarray(rmn2), 0, bits=bits, cs=V._SKIP_CHUNK_ROWS,
            n_chunks=nch, rows=8, ny=24))
        dense_up = {4: V._upload_slab_bq4, 3: V._upload_slab_bq3,
                    2: V._upload_slab_bq2}[bits]
        dense = np.asarray(dense_up(jnp.zeros_like(jnp.asarray(sl)),
                                    jnp.asarray(packed), jnp.asarray(rsc),
                                    jnp.asarray(rmn), 0))
        R = 8 * 24
        cs = V._SKIP_CHUNK_ROWS
        keep_chunk = np.zeros(nch, bool)
        keep_chunk[idx[idx < nch]] = True
        keep_rows = np.repeat(keep_chunk, cs)[:R].reshape(8, 24)
        np.testing.assert_array_equal(out[keep_rows], dense[keep_rows])
        qmax = float((1 << bits) - 1)
        mid = (rmn + 0.5 * rsc * qmax)[..., None] * np.ones_like(sl)
        np.testing.assert_allclose(out[~keep_rows], mid[~keep_rows],
                                   rtol=1e-6)


def test_streamed_skip_background_neutral_on_vessels():
    """skip_background=True leaves the vesselness response unchanged on
    and around the vessel (its rows are kept bit-exactly) and keeps the
    background response negligible."""
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness_streamed

    rng = np.random.default_rng(23)
    raw = rng.normal(100.0, 2.0, (40, 48, 64)).astype(np.float32)
    raw[18:22, 20:24, :] += 120.0
    v0, _, _ = frangi_vesselness_streamed(raw, sigmas=(1.0, 2.0),
                                          chunk_z=16, bits=4)
    v1, _, _ = frangi_vesselness_streamed(raw, sigmas=(1.0, 2.0),
                                          chunk_z=16, bits=4,
                                          skip_background=True)
    a, b = np.asarray(v0), np.asarray(v1)
    # vessel rows (and everything in their kept chunks) are bit-exact on
    # the wire, so the response only moves where the smoothing mixes in
    # flattened background — a small perturbation everywhere (the
    # fixture's noise-floor response, ~0.24 here, is identical in both)
    assert a[16:24, 16:28, :].max() > 0.2
    np.testing.assert_allclose(b, a, atol=0.03)
    # and the skip actually engaged on the vessel slab (fields differ)
    assert not np.array_equal(a, b)


def test_pack_compact_native_matches_post_pack_compact():
    """The stats-then-pack-selected native path produces the identical
    (payload, idx, sideband) tuple as packing everything then
    compacting (same scan, same rounding, same keep decision)."""
    from arterynetwork_tpu.ops.native import bq_pack_native
    from arterynetwork_tpu.ops import vesselness as V

    rng = np.random.default_rng(29)
    sl = rng.normal(100.0, 2.0, (8, 24, 64)).astype(np.float32)
    sl[3, 5, 20:30] += 120.0
    sl[6, 17, :10] += 120.0
    for bits in (4, 3, 2):
        packed, rsc, rmn = bq_pack_native(sl, bits)
        ref = V._compact_bq_slab(packed, rsc, rmn, bits)
        fast = V._pack_compact_native(sl, bits)
        assert ref is not None and fast is not None
        for a, b, name in zip(fast, ref,
                              ("pay", "idx", "rsc", "rmn", "nch")):
            np.testing.assert_array_equal(a, b, err_msg=name)
