"""Fused full-grid region-grow sweep (Pallas).

One kernel launch per iteration computes, in a single pass over the
volume, what the XLA full-grid path (ops/region_grow.py) spreads over
separate histogram / dilation / sign / XOR programs:

  boundary mask -> flip decision -> new segmentation -> +/- histogram
  DELTAS of the flipped voxels

The histogram trick: the region histograms change only at flipped
voxels, so carrying ``inner_hist`` across iterations and accumulating a
sparse delta per sweep replaces the full-volume histogram pass (the
dominant cost of the XLA path) with a pass that is already needed for
the boundary/flip math.  Counts are integers and stay exact in f32.

Kernel shape rules followed (CLAUDE.md Mosaic traps):
  * everything is 0/1 bf16 *arithmetic* (products/maxima), no 3D bool
    vectors;
  * the delta histogram keeps the batched (R, 16, L) x (R, 16, L)
    nibble-factorized dot (single contracting dim);
  * lane shifts use ``pltpu.roll`` with non-negative shifts + iota
    masks for the zero fill;
  * in/out segmentation buffers are distinct (no same-launch halo
    aliasing).

The decision math is bit-identical to the XLA path: same bin
quantization, same K @ hist tables computed in XLA between sweeps, same
packed-sign-word per-voxel test, same >= tie rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_x32 = functools.partial(jax.enable_x64, False)

_SUBLANE = 8  # tile sublane-dim alignment


def _shift_zero(x, sh, axis):
    """Shift with zero fill (non-negative roll + iota mask)."""
    n = x.shape[axis]
    r = pltpu.roll(x, sh % n, axis)
    io = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if sh > 0:
        return jnp.where(io >= sh, r, 0).astype(x.dtype)
    return jnp.where(io < n + sh, r, 0).astype(x.dtype)


def _d9(s):
    """In-plane 3x3 box max with zero fill (separable)."""
    a = jnp.maximum(jnp.maximum(_shift_zero(s, 1, 0),
                                _shift_zero(s, -1, 0)), s)
    return jnp.maximum(jnp.maximum(_shift_zero(a, 1, 1),
                                   _shift_zero(a, -1, 1)), a)


def _sweep_kernel(Y, X, Y0, X0, seg_p_ref, seg_c_ref, seg_n_ref, idx_ref,
                  words_ref, out_ref, hp_ref, hn_ref,
                  accp, accn):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        accp[:] = jnp.zeros_like(accp)
        accn[:] = jnp.zeros_like(accn)

    # all shift/boundary math in f32: Mosaic's lane rotate requires
    # 32-bit data (bf16 is only the HBM wire format for the masks)
    one = jnp.float32(1)
    wp = jnp.where(i > 0, one, 0).astype(jnp.float32)
    wn = jnp.where(i < n - 1, one, 0).astype(jnp.float32)
    sp = seg_p_ref[0].astype(jnp.float32) * wp  # clamped slice: no contribution
    sc = seg_c_ref[0].astype(jnp.float32)
    sn = seg_n_ref[0].astype(jnp.float32) * wn

    # dilate26(seg) and dilate26(~seg) at this slice, with the XLA
    # path's zero padding: outside the volume is neither seg nor ~seg.
    # Y/X pad rows/lanes are outside the volume too — mask them out of
    # the complement terms (pad voxels read seg=0 and would otherwise
    # count as background, spuriously marking the volume's high face
    # as boundary), mirroring the wp/wn z-clamp treatment.
    if Y0 != Y or X0 != X:
        vy = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0) < Y0
        vx = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1) < X0
        vmask = (vy & vx).astype(jnp.float32)
    else:
        vmask = jnp.ones((Y, X), jnp.float32)
    dil_s = jnp.maximum(jnp.maximum(_d9(sp), _d9(sc)), _d9(sn))
    dil_n = jnp.maximum(jnp.maximum(_d9((one - sp) * wp * vmask),
                                    _d9((one - sc) * vmask)),
                        _d9((one - sn) * wn * vmask))
    bnd = dil_s * dil_n         # 0/1: mixed 27-neighborhood

    # sign bit of diff at this voxel's bin, from 8 packed 32-bit words
    idx_i = idx_ref[0].astype(jnp.int32)
    w = idx_i >> 5
    sel = jnp.zeros(idx_i.shape, jnp.int32)
    for k in range(8):
        sel = jnp.where(w == k, words_ref[k], sel)
    bit = ((sel >> (idx_i & 31)) & 1).astype(jnp.float32)

    # flip where boundary and seg != target; XOR as 0/1 arithmetic.
    # Pad rows/lanes (beyond the true Y0/X0 extent) must never flip:
    # they are adjacent to real voxels through the zero-filled shifts
    # and would otherwise enter the region through the boundary mask.
    xor_tgt = sc + bit - 2 * sc * bit
    flips = bnd * xor_tgt
    if Y0 != Y or X0 != X:
        flips = flips * vmask
    out_ref[0] = (sc + flips - 2 * sc * flips).astype(jnp.bfloat16)

    # nibble-factorized +/- delta histogram over the flipped voxels,
    # one full-tile contraction, skipped entirely when the slice has no
    # flips (flips live only on the region boundary, so most slices
    # skip; measured faster than row-chunked variants — the per-chunk
    # loop overhead dominated, not the one-hot width).
    n_here = jnp.sum(flips)

    @pl.when(n_here > 0)
    def _():
        fl = flips.astype(jnp.bfloat16)
        s0 = sc.astype(jnp.bfloat16)
        ic = idx_ref[0].astype(jnp.int32)
        hi = (ic >> 4)[:, None, :]
        lo = (ic & 15)[:, None, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (Y, 16, X), 1)
        oh_hi = (hi == iota).astype(jnp.bfloat16)
        oh_lo = (lo == iota).astype(jnp.bfloat16)
        m_pos = (fl * (jnp.bfloat16(1) - s0))[:, None, :]
        m_neg = (fl * s0)[:, None, :]
        pos = jax.lax.dot_general(
            oh_hi * m_pos, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        neg = jax.lax.dot_general(
            oh_hi * m_neg, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        accp[:] = accp[:] + jnp.sum(pos, axis=0)
        accn[:] = accn[:] + jnp.sum(neg, axis=0)

    @pl.when(i == n - 1)
    def _():
        hp_ref[:] = accp[:]
        hn_ref[:] = accn[:]


def fused_sweep(seg_t, idx_t, sign_words, valid_yx=None,
                interpret: bool = False):
    """One region-grow sweep over a (Z, Y, X) volume.

    seg_t:      bf16[Z, Y, X] 0/1 segmentation (Y % 8 == 0, X % 128 == 0)
    idx_t:      bf16[Z, Y, X] bin indices (0..255; exact in bf16)
    sign_words: i32[8] packed sign bits of the decision table

    Returns (seg_new bf16[Z, Y, X], hist_pos f32[16, 16],
    hist_neg f32[16, 16]) where bin = 16*hi + lo row-major.
    ``valid_yx`` = (Y0, X0) true extents when the tile dims are padded.
    """
    Z, Y, X = seg_t.shape
    assert Y % _SUBLANE == 0 and X % 128 == 0, (Y, X)
    Y0, X0 = valid_yx if valid_yx is not None else (Y, X)

    def imap_p(i):
        return (jnp.maximum(i - 1, 0), 0, 0)

    def imap_c(i):
        return (i, 0, 0)

    def imap_n(i):
        return (jnp.minimum(i + 1, Z - 1), 0, 0)

    slice_spec = functools.partial(pl.BlockSpec, (1, Y, X),
                                   memory_space=pltpu.VMEM)
    words2 = sign_words.reshape(8).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_sweep_kernel, Y, X, int(Y0), int(X0)),
        grid=(Z,),
        in_specs=[slice_spec(imap_p), slice_spec(imap_c),
                  slice_spec(imap_n), slice_spec(imap_c),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[slice_spec(imap_c),
                   pl.BlockSpec((16, 16), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((16, 16), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Z, Y, X), jnp.bfloat16),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, 16), jnp.float32),
                        pltpu.VMEM((16, 16), jnp.float32)],
        interpret=interpret,
    )(seg_t, seg_t, seg_t, idx_t, words2)


def pack_sign_words(table):
    """f32[256] decision table -> i32[8] packed (diff >= 0) bits."""
    bits = (table >= 0).astype(jnp.uint32)
    return jnp.sum(bits.reshape(8, 32)
                   << jnp.arange(32, dtype=jnp.uint32)[None, :],
                   axis=1, dtype=jnp.uint32).astype(jnp.int32)


# ----------------------------------------------------------------------
# Full region grower around the fused sweep
# ----------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("iter_max", "max_segment_size",
                                    "perm", "pads", "band"))
def _region_grow_fused_jit(data, seed_mask, H, max_segment_size,
                           iter_max, perm, pads, band=0):
    from .histogram import masked_histogram_one
    from .region_grow import A_NORM, RegionGrowResult, _quantize

    num_bins = 256
    dtype = jnp.float32
    data = data.astype(dtype)
    seg0 = seed_mask.astype(jnp.bool_)

    bin_idx, bin_values = _quantize(data, num_bins)
    bin_idx_flat = bin_idx.reshape(-1)
    diffv = bin_values[:, None] - bin_values[None, :]
    K = (A_NORM * jnp.exp(-0.5 * H * diffv * diffv)).astype(dtype)

    hist_all = masked_histogram_one(
        bin_idx_flat, jnp.ones_like(bin_idx_flat, jnp.bool_),
        num_bins).astype(dtype)
    inner0 = masked_histogram_one(bin_idx_flat, seg0.reshape(-1),
                                  num_bins).astype(dtype)

    # layout for the kernel: grid over perm[0], (sublane, lane) padded
    pad_y, pad_x = pads
    shape_t = tuple(data.shape[p] for p in perm)
    valid_yx = (shape_t[1], shape_t[2])

    def to_kernel(x, fill):
        xt = jnp.transpose(x, perm)
        return jnp.pad(xt, ((0, 0), (0, pad_y), (0, pad_x)),
                       constant_values=fill)

    idx_t = to_kernel(bin_idx, 0).astype(jnp.bfloat16)
    seg_t0 = to_kernel(seg0, False).astype(jnp.bfloat16)

    inv_perm = tuple(int(np.argsort(np.asarray(perm))[i])
                     for i in range(3))

    def cond(state):
        _, _, _, _, stop = state
        return stop < 0

    def body(state):
        seg_t, inner_hist, it, count, _ = state
        outer_hist = hist_all - inner_hist
        isz = jnp.maximum(jnp.sum(inner_hist), jnp.asarray(1.0, dtype))
        osz = jnp.maximum(jnp.sum(outer_hist), jnp.asarray(1.0, dtype))
        diff = (K @ inner_hist) / isz - (K @ outer_hist) / osz
        words = pack_sign_words(diff)
        if band:
            # manual-DMA window variant (single HBM input ref) when the
            # banded axis has room for the halo window; the 9-block-spec
            # variant covers the residual small-axis shapes
            if shape_t[1] + pad_y >= band + 16:
                seg_new, hp, hn = fused_sweep_banded_dma(
                    seg_t, idx_t, words, valid_yx=valid_yx, band=band)
            else:
                seg_new, hp, hn = fused_sweep_banded(seg_t, idx_t, words,
                                                     valid_yx=valid_yx,
                                                     band=band)
        else:
            seg_new, hp, hn = fused_sweep(seg_t, idx_t, words,
                                          valid_yx=valid_yx)
        n_pos = jnp.sum(hp).astype(jnp.int32)
        n_neg = jnp.sum(hn).astype(jnp.int32)
        converged = (n_pos + n_neg) == 0
        inner_new = inner_hist + (hp - hn).reshape(num_bins)
        count_new = count + n_pos - n_neg
        size_capped = count_new >= max_segment_size
        it_new = it + (~converged).astype(jnp.int32)
        stop = jnp.where(converged & ~size_capped, 0,
                         jnp.where(size_capped, 1,
                                   jnp.where(it_new >= iter_max, 2, -1)))
        return seg_new, inner_new, it_new, count_new, stop.astype(jnp.int32)

    count0 = jnp.sum(seg0, dtype=jnp.int32)
    stop0 = jnp.where(count0 >= max_segment_size, 1, -1).astype(jnp.int32)
    state0 = (seg_t0, inner0, jnp.zeros((), jnp.int32), count0, stop0)
    seg_t, _, it, count, stop = jax.lax.while_loop(cond, body, state0)

    seg = jnp.transpose(
        seg_t[:, :valid_yx[0], :valid_yx[1]] != 0, inv_perm)
    return RegionGrowResult(segmented_map=seg,
                            active_map=jnp.ones_like(seg),
                            iterations=it, segmented_count=count,
                            stop_reason=stop)


# largest per-slice f32 working tile the kernel may use: the sweep holds
# ~15 live tile-sized temporaries (shift chains, boundary fields) against
# the 16 MiB scoped-VMEM limit
_MAX_TILE_F32_BYTES = 450_000


def fused_tile_fits(shape) -> bool:
    """True when the volume's kernel layout fits the VMEM budget (grid
    over the largest axis, tile = (smallest, middle) padded)."""
    axes = sorted(range(3), key=lambda a: shape[a])
    sub = shape[axes[0]] + (-shape[axes[0]]) % _SUBLANE
    lane = shape[axes[1]] + (-shape[axes[1]]) % 128
    return sub * lane * 4 <= _MAX_TILE_F32_BYTES


_BAND = 128  # sublane band rows for the large-tile variant


def region_grow_fused(data, seed_mask, H: float = 2.25,
                      max_segment_size: int = 5000,
                      iter_max: int = 200):
    """Full-grid region growing with the fused Pallas sweep (same fixed
    point as the XLA path with ``excluded_mask=None``, 256 bins).

    Small tiles use the single-slice kernel; above the VMEM tile budget
    (``fused_tile_fits`` False — Speck scale) the banded 2D-grid variant
    takes over."""
    data = jnp.asarray(data)
    axes = sorted(range(3), key=lambda a: data.shape[a])
    if fused_tile_fits(data.shape):
        # grid over the LARGEST axis; smallest -> sublanes, middle ->
        # lanes: the whole slice tile fits scoped VMEM
        perm = (axes[2], axes[0], axes[1])
        shape_t = tuple(data.shape[p] for p in perm)
        pads = ((-shape_t[1]) % _SUBLANE, (-shape_t[2]) % 128)
        band = 0
    else:
        # banded: grid over the largest axis, lane = the axis with the
        # least 128-padding waste, sublane = the other (banded by the
        # second grid dimension)
        rem = axes[:2]
        waste = [(-data.shape[a]) % 128 for a in rem]
        lane_axis = rem[int(np.argmin(waste))]
        sub_axis = rem[1 - int(np.argmin(waste))]
        perm = (axes[2], sub_axis, lane_axis)
        shape_t = tuple(data.shape[p] for p in perm)
        band = _BAND
        pads = ((-shape_t[1]) % band, (-shape_t[2]) % 128)
    with _x32():
        return _region_grow_fused_jit(data, jnp.asarray(seed_mask),
                                      float(H), int(max_segment_size),
                                      int(iter_max), perm, pads, band)


# ----------------------------------------------------------------------
# Large-tile variant: 2D grid (slice, sublane band)
#
# Above the single-slice tile budget (fused_tile_fits False — Speck
# scale), the sublane axis is banded by a second grid dimension.  The
# band halo comes from 9 clamped block specs (3 z-slices x 3 bands);
# each kernel step assembles a (band+16)-row window from the three band
# blocks with STATIC 8-aligned slices, computes the sweep on the
# window, and writes the interior band.  Out-of-volume rows (band
# clamps and sublane padding) are masked per-row, which also supplies
# the volume-face zero fill.
# ----------------------------------------------------------------------


def _banded_kernel(band, X, Y0, X0, Z,
                   spp_ref, spc_ref, spn_ref,
                   scp_ref, scc_ref, scn_ref,
                   snp_ref, snc_ref, snn_ref,
                   idx_ref, words_ref, out_ref, hp_ref, hn_ref,
                   accp, accn):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nz = pl.num_programs(0)

    @pl.when((i == 0) & (j == 0))
    def _():
        accp[:] = jnp.zeros_like(accp)
        accn[:] = jnp.zeros_like(accn)

    W = band + 16
    # global row of each window row; rows outside [0, Y0) are not part
    # of the volume (edge-block clamps and sublane padding) — masking
    # them doubles as the volume-face zero fill
    row0 = j * band - 8
    grow = jax.lax.broadcasted_iota(jnp.int32, (W, X), 0) + row0
    row_ok = ((grow >= 0) & (grow < Y0)).astype(jnp.float32)
    if X0 != X:
        # lane pads are outside the volume just like out-of-range rows:
        # fold the X validity into the same mask so the complement
        # (background) dilation never reads pad lanes as background
        vxw = jax.lax.broadcasted_iota(jnp.int32, (W, X), 1) < X0
        row_ok = row_ok * vxw.astype(jnp.float32)
    wp = jnp.where(i > 0, 1.0, 0.0).astype(jnp.float32)
    wn = jnp.where(i < nz - 1, 1.0, 0.0).astype(jnp.float32)

    def window(p_ref, c_ref, n_ref):
        return jnp.concatenate(
            [p_ref[0, band - 8:band, :], c_ref[0], n_ref[0, 0:8, :]],
            axis=0).astype(jnp.float32)

    sp = window(spp_ref, spc_ref, spn_ref) * row_ok * wp
    sc = window(scp_ref, scc_ref, scn_ref) * row_ok
    sn = window(snp_ref, snc_ref, snn_ref) * row_ok * wn

    dil_s = jnp.maximum(jnp.maximum(_d9(sp), _d9(sc)), _d9(sn))
    dil_n = jnp.maximum(
        jnp.maximum(_d9((1.0 - sp) * row_ok * wp),
                    _d9((1.0 - sc) * row_ok)),
        _d9((1.0 - sn) * row_ok * wn))
    bnd = dil_s * dil_n

    # sign bit per interior voxel; halo rows are masked off below so
    # their (zero-padded) bins are irrelevant
    idx_i = idx_ref[0].astype(jnp.int32)          # (band, X)
    w = idx_i >> 5
    sel = jnp.zeros(idx_i.shape, jnp.int32)
    for k in range(8):
        sel = jnp.where(w == k, words_ref[k], sel)
    bit = ((sel >> (idx_i & 31)) & 1).astype(jnp.float32)

    sc_main = sc[8:8 + band, :]
    bnd_main = bnd[8:8 + band, :] * row_ok[8:8 + band, :]
    xor_tgt = sc_main + bit - 2 * sc_main * bit
    flips = bnd_main * xor_tgt
    if X0 != X:
        vx = jax.lax.broadcasted_iota(jnp.int32, (band, X), 1) < X0
        flips = flips * vx.astype(jnp.float32)

    out_ref[0] = (sc_main + flips - 2 * sc_main * flips)         .astype(jnp.bfloat16)

    n_here = jnp.sum(flips)

    @pl.when(n_here > 0)
    def _():
        fl = flips.astype(jnp.bfloat16)
        s0 = sc_main.astype(jnp.bfloat16)
        hi = (idx_i >> 4)[:, None, :]
        lo = (idx_i & 15)[:, None, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (band, 16, X), 1)
        oh_hi = (hi == iota).astype(jnp.bfloat16)
        oh_lo = (lo == iota).astype(jnp.bfloat16)
        m_pos = (fl * (jnp.bfloat16(1) - s0))[:, None, :]
        m_neg = (fl * s0)[:, None, :]
        pos = jax.lax.dot_general(
            oh_hi * m_pos, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        neg = jax.lax.dot_general(
            oh_hi * m_neg, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        accp[:] = accp[:] + jnp.sum(pos, axis=0)
        accn[:] = accn[:] + jnp.sum(neg, axis=0)

    @pl.when((i == nz - 1) & (j == pl.num_programs(1) - 1))
    def _():
        hp_ref[:] = accp[:]
        hn_ref[:] = accn[:]


def _banded_dma_kernel(band, X, Y0, X0, Z, seg_hbm, idx_ref, words_ref,
                       out_ref, hp_ref, hn_ref,
                       win, sem, st_seg, st_flip, accp, accn):
    """Manual-DMA variant of the banded sweep: the (band+16)-row window
    is copied from the full HBM segmentation ref (3 clamped z-slices)
    instead of being assembled from 9 neighbor block specs — one input
    ref, no window concatenate, the structure the remote AOT compiler
    handled standalone.  Dynamic offsets touch only REFS and are always
    8-aligned (band % 8 == 0 keeps every start on a sublane boundary)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nz = pl.num_programs(0)
    nb = pl.num_programs(1)
    W = band + 16
    Yp = nb * band

    @pl.when((i == 0) & (j == 0))
    def _():
        accp[:] = jnp.zeros_like(accp)
        accn[:] = jnp.zeros_like(accn)

    # window rows [s, s+W) of the unpadded (Yp >= W) row space; the
    # clamped start keeps the copy in range and stays 8-aligned, the
    # interior band lives at offset o = j*band - s in {0, 8, 16}
    s = jnp.clip(j * band - 8, 0, Yp - W)
    o = j * band - s
    dmas = []
    for dz in range(3):
        zc = jnp.clip(i + dz - 1, 0, Z - 1)
        dmas.append(pltpu.make_async_copy(
            seg_hbm.at[zc, pl.ds(s, W), :], win.at[dz], sem.at[dz]))
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    grow = jax.lax.broadcasted_iota(jnp.int32, (W, X), 0) + s
    row_ok = (grow < Y0).astype(jnp.float32)   # s >= 0: no lower bound
    if X0 != X:
        vxw = jax.lax.broadcasted_iota(jnp.int32, (W, X), 1) < X0
        row_ok = row_ok * vxw.astype(jnp.float32)
    # rows outside [j*band-8, j*band+band+8) belong to other bands'
    # windows only when the start was edge-clamped; they are real rows
    # (clamping only happens inside the volume), so no extra masking
    wp = jnp.where(i > 0, 1.0, 0.0).astype(jnp.float32)
    wn = jnp.where(i < nz - 1, 1.0, 0.0).astype(jnp.float32)
    sp = win[0].astype(jnp.float32) * row_ok * wp
    sc = win[1].astype(jnp.float32) * row_ok
    sn = win[2].astype(jnp.float32) * row_ok * wn

    dil_s = jnp.maximum(jnp.maximum(_d9(sp), _d9(sc)), _d9(sn))
    dil_n = jnp.maximum(
        jnp.maximum(_d9((1.0 - sp) * row_ok * wp),
                    _d9((1.0 - sc) * row_ok)),
        _d9((1.0 - sn) * row_ok * wn))
    bnd = dil_s * dil_n * row_ok

    st_seg[:] = sc
    st_flip[:] = bnd
    sc_main = st_seg[pl.ds(o, band), :]
    bnd_main = st_flip[pl.ds(o, band), :]

    idx_i = idx_ref[0].astype(jnp.int32)          # (band, X)
    w = idx_i >> 5
    sel = jnp.zeros(idx_i.shape, jnp.int32)
    for k in range(8):
        sel = jnp.where(w == k, words_ref[k], sel)
    bit = ((sel >> (idx_i & 31)) & 1).astype(jnp.float32)

    xor_tgt = sc_main + bit - 2 * sc_main * bit
    flips = bnd_main * xor_tgt
    out_ref[0] = (sc_main + flips - 2 * sc_main * flips) \
        .astype(jnp.bfloat16)

    n_here = jnp.sum(flips)

    @pl.when(n_here > 0)
    def _():
        fl = flips.astype(jnp.bfloat16)
        s0 = sc_main.astype(jnp.bfloat16)
        hi = (idx_i >> 4)[:, None, :]
        lo = (idx_i & 15)[:, None, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (band, 16, X), 1)
        oh_hi = (hi == iota).astype(jnp.bfloat16)
        oh_lo = (lo == iota).astype(jnp.bfloat16)
        m_pos = (fl * (jnp.bfloat16(1) - s0))[:, None, :]
        m_neg = (fl * s0)[:, None, :]
        pos = jax.lax.dot_general(
            oh_hi * m_pos, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        neg = jax.lax.dot_general(
            oh_hi * m_neg, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        accp[:] = accp[:] + jnp.sum(pos, axis=0)
        accn[:] = accn[:] + jnp.sum(neg, axis=0)

    @pl.when((i == nz - 1) & (j == nb - 1))
    def _():
        hp_ref[:] = accp[:]
        hn_ref[:] = accn[:]


def fused_sweep_banded_dma(seg_t, idx_t, sign_words, valid_yx=None,
                           band: int = 128, interpret: bool = False):
    """Manual-DMA banded sweep: same contract as ``fused_sweep_banded``
    but the halo window comes from explicit async copies out of the full
    HBM ref.  Requires Yp >= band + 16 (two or more bands)."""
    Z, Y, X = seg_t.shape
    assert Y % band == 0 and X % 128 == 0 and band % 8 == 0, (Y, X, band)
    assert Y >= band + 16, (Y, band)
    Y0, X0 = valid_yx if valid_yx is not None else (Y, X)
    nb = Y // band
    W = band + 16

    words2 = sign_words.reshape(8).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_banded_dma_kernel, band, X, int(Y0), int(X0),
                          Z),
        grid=(Z, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, band, X), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1, band, X), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((16, 16), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((16, 16), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Z, Y, X), jnp.bfloat16),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((3, W, X), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((3,)),
                        pltpu.VMEM((W, X), jnp.float32),
                        pltpu.VMEM((W, X), jnp.float32),
                        pltpu.VMEM((16, 16), jnp.float32),
                        pltpu.VMEM((16, 16), jnp.float32)],
        interpret=interpret,
    )(seg_t, idx_t, words2)


def fused_sweep_banded(seg_t, idx_t, sign_words, valid_yx=None,
                       band: int = 128, interpret: bool = False):
    """Large-tile sweep: grid (Z, Y/band), same contract as
    ``fused_sweep``.  ``seg_t`` is (Z, Yp, Xp) with Yp % band == 0.

    The band halo comes from the clamped neighbor-band blocks (9 seg
    specs); only their 8 edge rows are consumed (static 8-aligned
    slices), and flip/histogram math runs on the interior band rows
    only, keeping the per-step working set inside scoped VMEM."""
    Z, Y, X = seg_t.shape
    assert Y % band == 0 and X % 128 == 0 and band % 8 == 0, (Y, X, band)
    Y0, X0 = valid_yx if valid_yx is not None else (Y, X)
    nb = Y // band

    def spec(di, dj):
        def imap(i, j):
            return (jnp.clip(i + di, 0, Z - 1),
                    jnp.clip(j + dj, 0, nb - 1), 0)
        return pl.BlockSpec((1, band, X), imap, memory_space=pltpu.VMEM)

    def main_spec(di):
        return spec(di, 0)

    seg_specs = [spec(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
    words2 = sign_words.reshape(8).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_banded_kernel, band, X, int(Y0), int(X0), Z),
        grid=(Z, nb),
        in_specs=seg_specs + [main_spec(0),
                              pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[main_spec(0),
                   pl.BlockSpec((16, 16), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((16, 16), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Z, Y, X), jnp.bfloat16),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32),
                   jax.ShapeDtypeStruct((16, 16), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, 16), jnp.float32),
                        pltpu.VMEM((16, 16), jnp.float32)],
        interpret=interpret,
    )(*([seg_t] * 9), idx_t, words2)
