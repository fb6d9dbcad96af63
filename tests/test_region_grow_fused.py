"""Fused Pallas region-grow sweep: parity with the XLA full-grid path.

The kernel runs in Pallas interpret mode on the CPU mesh; decision math
(boundary, sign table, flips, histogram deltas) must match the XLA
formulation bit-for-bit, iteration by iteration.  On real TPU hardware
the same parity holds compiled (asserted every bench run:
bench_region_grow compares fused vs XLA fixed points)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from arterynetwork_tpu.ops.histogram import (_masked_histograms_scatter,
                                             sign_lookup)
from arterynetwork_tpu.ops.region_grow import A_NORM, _quantize
from arterynetwork_tpu.ops.region_grow_fused import (fused_sweep,
                                                     fused_tile_fits,
                                                     pack_sign_words)
from arterynetwork_tpu.ops.stencil import dilate26

_x32 = functools.partial(jax.enable_x64, False)


def test_fused_sweep_matches_xla_iterations():
    rng = np.random.default_rng(0)
    Z, Y, X = 12, 16, 128
    data = rng.normal(0.1, 0.05, (Z, Y, X)).astype(np.float32)
    data[5:8, 6:10, 30:90] += 0.8
    seed = np.zeros((Z, Y, X), bool)
    seed[6, 7, 50:60] = True

    with _x32():
        dj = jnp.asarray(data)
        bin_idx, bin_values = _quantize(dj, 256)
        H = 2.25
        dv = bin_values[:, None] - bin_values[None, :]
        K = (A_NORM * jnp.exp(-0.5 * H * dv * dv)).astype(jnp.float32)
        seg = jnp.asarray(seed)
        ones = jnp.ones((1, Z * Y * X), bool)
        hist_all = _masked_histograms_scatter(bin_idx.reshape(-1), ones,
                                              256)[0]
        for it in range(3):
            inner = _masked_histograms_scatter(
                bin_idx.reshape(-1), seg.reshape(1, -1), 256)[0]
            outer = hist_all - inner
            isz = jnp.maximum(jnp.sum(inner), 1.0)
            osz = jnp.maximum(jnp.sum(outer), 1.0)
            diff = (K @ inner) / isz - (K @ outer) / osz
            bnd = dilate26(seg) & dilate26(~seg)
            flips_ref = bnd & jnp.logical_xor(seg, sign_lookup(bin_idx,
                                                               diff))
            seg_ref = jnp.logical_xor(seg, flips_ref)

            seg_new, hp, hn = fused_sweep(
                seg.astype(jnp.bfloat16), bin_idx.astype(jnp.bfloat16),
                pack_sign_words(diff), interpret=True)
            np.testing.assert_array_equal(np.asarray(seg_new) != 0,
                                          np.asarray(seg_ref))
            d_ref = (_masked_histograms_scatter(
                bin_idx.reshape(-1), (flips_ref & ~seg).reshape(1, -1),
                256)[0]
                - _masked_histograms_scatter(
                    bin_idx.reshape(-1), (flips_ref & seg).reshape(1, -1),
                    256)[0])
            np.testing.assert_allclose(
                np.asarray(hp - hn).reshape(256), np.asarray(d_ref))
            seg = seg_ref
        assert int(jnp.sum(seg)) > int(np.sum(seed))


def test_fused_sweep_padded_lanes_never_flip():
    """Pad voxels beyond the true extent must not enter the region."""
    rng = np.random.default_rng(1)
    Z, Y, X = 6, 16, 128
    data = rng.normal(0.1, 0.02, (Z, Y, X)).astype(np.float32)
    data[2:4, 4:12, 80:128] += 0.9       # bright region crossing the pad
    seed = np.zeros((Z, Y, X), bool)
    seed[3, 8, 90:98] = True             # seeds inside the valid extent
    with _x32():
        bin_idx, bin_values = _quantize(jnp.asarray(data), 256)
        # a table that wants to flip EVERY boundary voxel inward
        diff = jnp.ones((256,), jnp.float32)
        seg_new, hp, hn = fused_sweep(
            jnp.asarray(seed).astype(jnp.bfloat16),
            bin_idx.astype(jnp.bfloat16),
            pack_sign_words(diff), valid_yx=(Y, 100), interpret=True)
        out = np.asarray(seg_new) != 0
        assert not out[:, :, 100:].any()
        assert out[:, :, :100].sum() >= seed[:, :, :100].sum()


def test_fused_sweep_padded_face_parity():
    """Real voxels on the volume's high Y/X faces (adjacent to pad
    rows/lanes) follow the XLA zero-pad semantics: pad voxels are
    neither seg nor ~seg, so an interior seg voxel at the face is NOT
    boundary through the pad and must never erode."""
    rng = np.random.default_rng(7)
    Z, Y0, X0 = 6, 12, 100
    Y, X = 16, 128
    data = rng.normal(0.1, 0.05, (Z, Y0, X0)).astype(np.float32)
    data[2:5, 6:12, 60:100] += 0.8      # bright region on both high faces
    seed = np.zeros((Z, Y0, X0), bool)
    seed[3, 8:12, 80:100] = True        # seg touches both padded faces

    with _x32():
        bin_idx, bin_values = _quantize(jnp.asarray(data), 256)
        pad = ((0, 0), (0, Y - Y0), (0, X - X0))
        idx_p = jnp.pad(bin_idx, pad).astype(jnp.bfloat16)

        # targeted erosion check: a table that wants EVERYTHING out only
        # flips true-boundary seg voxels; interior face voxels stay
        diff_out = -jnp.ones((256,), jnp.float32)
        seg = jnp.asarray(seed)
        bnd = dilate26(seg) & dilate26(~seg)
        seg_ref = seg & ~bnd
        seg_new, _, _ = fused_sweep(
            jnp.pad(seg, pad).astype(jnp.bfloat16), idx_p,
            pack_sign_words(diff_out), valid_yx=(Y0, X0), interpret=True)
        np.testing.assert_array_equal(
            np.asarray(seg_new[:, :Y0, :X0]) != 0, np.asarray(seg_ref))
        assert not np.asarray(seg_new)[:, Y0:, :].any()
        assert not np.asarray(seg_new)[:, :, X0:].any()

        # full-iteration parity with the real decision table
        dv = bin_values[:, None] - bin_values[None, :]
        K = (A_NORM * jnp.exp(-0.5 * 2.25 * dv * dv)).astype(jnp.float32)
        ones = jnp.ones((1, Z * Y0 * X0), bool)
        hist_all = _masked_histograms_scatter(bin_idx.reshape(-1), ones,
                                              256)[0]
        seg = jnp.asarray(seed)
        for it in range(3):
            inner = _masked_histograms_scatter(
                bin_idx.reshape(-1), seg.reshape(1, -1), 256)[0]
            outer = hist_all - inner
            diff = ((K @ inner) / jnp.maximum(jnp.sum(inner), 1.0)
                    - (K @ outer) / jnp.maximum(jnp.sum(outer), 1.0))
            bnd = dilate26(seg) & dilate26(~seg)
            flips_ref = bnd & jnp.logical_xor(seg, sign_lookup(bin_idx,
                                                               diff))
            seg_ref = jnp.logical_xor(seg, flips_ref)
            seg_new, hp, hn = fused_sweep(
                jnp.pad(seg, pad).astype(jnp.bfloat16), idx_p,
                pack_sign_words(diff), valid_yx=(Y0, X0), interpret=True)
            out = np.asarray(seg_new) != 0
            assert not out[:, Y0:, :].any() and not out[:, :, X0:].any()
            np.testing.assert_array_equal(out[:, :Y0, :X0],
                                          np.asarray(seg_ref))
            seg = seg_ref


import pytest


def _banded_impl(name):
    from arterynetwork_tpu.ops import region_grow_fused as m
    return {"specs": m.fused_sweep_banded,
            "dma": m.fused_sweep_banded_dma}[name]


@pytest.mark.parametrize("impl", ["specs", "dma"])
def test_banded_sweep_padded_face_parity_impls(impl):
    """Banded variants: lane pads (X0 < X) masked out of the complement
    dilation exactly like out-of-range rows."""
    fused_sweep_banded = _banded_impl(impl)

    rng = np.random.default_rng(9)
    Z, Y0, X0 = 6, 28, 100
    Y, X = 32, 128
    data = rng.normal(0.1, 0.05, (Z, Y0, X0)).astype(np.float32)
    data[2:5, 14:28, 60:100] += 0.8
    seed = np.zeros((Z, Y0, X0), bool)
    seed[3, 20:28, 80:100] = True

    with _x32():
        bin_idx, _ = _quantize(jnp.asarray(data), 256)
        pad = ((0, 0), (0, Y - Y0), (0, X - X0))
        idx_p = jnp.pad(bin_idx, pad).astype(jnp.bfloat16)
        diff_out = -jnp.ones((256,), jnp.float32)
        seg = jnp.asarray(seed)
        bnd = dilate26(seg) & dilate26(~seg)
        seg_ref = seg & ~bnd
        seg_new, _, _ = fused_sweep_banded(
            jnp.pad(seg, pad).astype(jnp.bfloat16), idx_p,
            pack_sign_words(diff_out), valid_yx=(Y0, X0), band=16,
            interpret=True)
        np.testing.assert_array_equal(
            np.asarray(seg_new[:, :Y0, :X0]) != 0, np.asarray(seg_ref))
        assert not np.asarray(seg_new)[:, Y0:, :].any()
        assert not np.asarray(seg_new)[:, :, X0:].any()


def test_fused_tile_fits_gate():
    assert fused_tile_fits((512, 512, 170))
    assert not fused_tile_fits((880, 880, 640))  # Speck: XLA fallback


@pytest.mark.parametrize("impl", ["specs", "dma"])
def test_banded_sweep_matches_simple_sweep(impl):
    """Large-tile banded variants == single-slice kernel, band halos and
    all (interpret mode; both against the same XLA-computed flip)."""
    fused_sweep_banded = _banded_impl(impl)

    rng = np.random.default_rng(3)
    Z, Y, X = 8, 48, 128
    data = rng.normal(0.1, 0.05, (Z, Y, X)).astype(np.float32)
    data[3:6, 8:40, 30:90] += 0.8
    seed = np.zeros((Z, Y, X), bool)
    seed[4, 20, 50:60] = True

    with _x32():
        bin_idx, bin_values = _quantize(jnp.asarray(data), 256)
        dv = bin_values[:, None] - bin_values[None, :]
        K = (A_NORM * jnp.exp(-0.5 * 2.25 * dv * dv)).astype(jnp.float32)
        seg = jnp.asarray(seed)
        ones = jnp.ones((1, Z * Y * X), bool)
        hist_all = _masked_histograms_scatter(bin_idx.reshape(-1), ones,
                                              256)[0]
        for it in range(2):
            inner = _masked_histograms_scatter(
                bin_idx.reshape(-1), seg.reshape(1, -1), 256)[0]
            outer = hist_all - inner
            diff = ((K @ inner) / jnp.maximum(jnp.sum(inner), 1.0)
                    - (K @ outer) / jnp.maximum(jnp.sum(outer), 1.0))
            words = pack_sign_words(diff)
            s1, hp1, hn1 = fused_sweep(
                seg.astype(jnp.bfloat16), bin_idx.astype(jnp.bfloat16),
                words, interpret=True)
            s2, hp2, hn2 = fused_sweep_banded(
                seg.astype(jnp.bfloat16), bin_idx.astype(jnp.bfloat16),
                words, band=16, interpret=True)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
            np.testing.assert_allclose(np.asarray(hp1), np.asarray(hp2))
            np.testing.assert_allclose(np.asarray(hn1), np.asarray(hn2))
            seg = jnp.asarray(np.asarray(s1) != 0)
