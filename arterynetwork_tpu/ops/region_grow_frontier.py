"""Frontier-tile (block-sparse) variational region growing.

The full-grid kernel (ops/region_grow.py) sweeps the entire volume every
iteration; once the growing front is thin, almost all of that work
touches voxels whose state cannot change.  This variant keeps the same
fixed-point semantics but only *visits tiles that contain boundary
voxels*:

* The volume is split into (TZ, TY, full-X) tiles.  A per-tile activity
  set tracks which tiles currently contain inner/outer boundary voxels;
  flips reactivate the flipped tile and its tile neighbors (a tile with
  no boundary can only gain one through a neighboring flip).
* Each iteration compacts the active tile ids (``jnp.nonzero`` with a
  static bound) and launches ONE Pallas kernel over them with a
  TWO-PHASE grid (``PrefetchScalarGridSpec``, grid = (2, ceil(k/nb))):
  phase 0 snapshots every active tile's halo'd segmentation box into an
  HBM scratch buffer; phase 1 re-reads the snapshot into VMEM,
  evaluates the boundary + flip rule, and writes the updated interior
  IN PLACE into the live volume (``input_output_aliases``).  Because
  all snapshots complete before any write (sequential grid), every tile
  sees the previous iteration's state — exact Jacobi semantics without
  a full-volume double-buffer copy per iteration (the copy cost more
  than the snapshots: only active tiles are snapshotted).
* ``nb`` tiles are processed per grid step, stacked along z in one VMEM
  box (clamped to the scoped-VMEM budget): the fixed per-step cost —
  grid sequencing, scalar address math, DMA issue — amortizes over nb
  tiles, which is what broke the ~4 us/tile per-iteration floor.
* Region statistics are maintained incrementally: ``inner_hist`` is
  updated from the per-iteration flip deltas, so no full-volume
  histogram is ever recomputed; the flip decision table (the sign of
  ``innerProbNorm - outerProbNorm`` per intensity bin) is a BxB matvec
  packed into ``num_bins/32`` sign words, evaluated per voxel with
  shifts (no gather).
* The static volume geometry is precomputed into the bin word so the
  kernel never rebuilds it per tile: bits 0..7 = intensity bin, bit 8 =
  inside-volume flag, bits 9..13 = the 27-neighborhood inside-count.
  The boundary test is then ONE separable neighbor-sum of the
  segmentation (sum27), since
    #unsegmented-neighbors = sum27(inside) - sum27(seg)  (seg <= inside)
  which replaces the two separate 26-dilations of the original design.

Mosaic layout notes (these shaped the kernel):
* sublane (2nd-minor) slices must be 8-aligned and lane (minor) slices
  128-aligned or full — so tiles span the FULL x extent, the y halo is
  8 voxels wide (only 1 is used), and neighbor sums use roll-based
  separable adds (wrap-around garbage lands on box edges the interior
  never reads);
* 3D i1 vectors hit relayout bugs — all mask algebra runs in int32;
* values cannot be dynamically sliced — the histogram delta accumulates
  over static 8-row blocks, skipped when the block has no flips;
* Mosaic re-traces reduction lowerings at compile time under the global
  x64 config, so the x32 context wraps the jitted call, not just the
  traced body.

Per-voxel decision math is identical to ops/region_grow.py (reference
``variationalRegionGrowing``, variationalRegionGrowing.py:10-282, with
the >= tie rule); parity is at the converged fixed point.  Excluded
voxels (reference state 4) are not supported on this path — callers with
an ``excluded_mask`` use the full-grid kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .histogram import masked_histogram_one
from .region_grow import A_NORM, DEFAULT_H, DEFAULT_ITER_MAX, \
    DEFAULT_MAX_SEGMENT_SIZE, RegionGrowResult, _quantize
from .stencil import dilate26

_x32 = functools.partial(jax.enable_x64, False)

PADY = 8  # aligned y halo (only the innermost voxel of it is used)


def _roll(x, shift, axis):
    """Circular shift; axis 0 is untiled so static slicing is legal."""
    if axis == 0:
        n = x.shape[0]
        s = (-shift) % n
        if s == 0:
            return x
        return jnp.concatenate([x[s:], x[:s]], axis=0)
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _sum27(x):
    """Separable 27-neighborhood sum (center included).  Wrap-around
    garbage stays on box edges that the interior never reads."""
    for axis in range(3):
        x = x + _roll(x, 1, axis) + _roll(x, -1, axis)
    return x


def _frontier_kernel(TZ, TY, Xp, n_ty, num_bins, NB,
                     ids_ref, nact_ref,              # scalar prefetch
                     seg_in, bins_in, words_ref,     # inputs
                     seg_out, snap_ref, dhist_ref, flags_ref,  # outputs
                     seg_box, bin_box, acc,
                     snap_sems, in_seg_sems, in_bin_sems, out_sems):
    # seg_out is aliased to seg_in (in-place update of the live volume).
    # phase 0 snapshots each active tile's halo'd box into snap_ref;
    # phase 1 computes from the snapshot and writes the interior back —
    # sequential grid order means all snapshots happen before any write,
    # which is what keeps the sweep Jacobi (no tile ever reads a
    # same-iteration neighbor write through its halo).
    #
    # Each grid step processes NB tiles at once, stacked along the z
    # axis of one VMEM box: the vector ops amortize over NB tiles and
    # the fixed per-step cost (grid sequencing, scalar work, DMA issue)
    # is paid once per NB tiles.  Tile k's interior rows only ever read
    # rows of k's own halo'd sub-box, so the stacked _sum27 rolls never
    # couple neighboring tiles in the stack.
    #
    # All DMAs are double-buffered on step parity: snapshots overlap each
    # other; phase-1 step i prefetches step i+1's inputs into the other
    # buffer pair and leaves its own writebacks in flight, waited one
    # step later (or at the final step).  This hides most of the
    # per-tile DMA latency behind compute.
    del seg_in
    R = TY + 2 * PADY
    BZ = TZ + 2
    NBZ = NB * BZ
    W = num_bins // 32
    phase = pl.program_id(0)
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)
    nact = nact_ref[0]
    par = step & 1

    def slot_of(s, k):
        return s * NB + k

    def tile_zy(slot):
        tid = ids_ref[slot]
        nty32 = jnp.int32(n_ty)
        tz = (tid // nty32).astype(jnp.int32)
        ty = (tid % nty32).astype(jnp.int32)
        # (global z of the interior start, window start in the padded
        #  array == global y of the interior start)
        return tz * jnp.int32(TZ), ty * jnp.int32(TY)

    @pl.when((phase == 0) & (step == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(phase == 0)
    def _():
        # SMEM stores are scalar-only: zero this step's flag slots here
        # (phase 0 visits every step, including the invalid tail)
        for k in range(NB):
            flags_ref[slot_of(step, k), 0] = 0
            flags_ref[slot_of(step, k), 1] = 0

    def snap_copy(slot, z, y, sp, k):
        return pltpu.make_async_copy(
            seg_out.at[pl.ds(z, BZ), pl.ds(y, R), :],
            snap_ref.at[slot], snap_sems.at[sp, k])

    for k in range(NB):
        @pl.when((phase == 0) & (slot_of(step, k) < nact))
        def _(k=k):
            z, y = tile_zy(slot_of(step, k))
            snap_copy(slot_of(step, k), z, y, par, k).start()

        @pl.when((phase == 0) & (step >= 1)
                 & (slot_of(step - 1, k) < nact))
        def _(k=k):
            z, y = tile_zy(slot_of(step - 1, k))
            snap_copy(slot_of(step - 1, k), z, y, 1 - par, k).wait()

        @pl.when((phase == 0) & (step == n_steps - 1)
                 & (slot_of(step, k) < nact))
        def _(k=k):
            z, y = tile_zy(slot_of(step, k))
            snap_copy(slot_of(step, k), z, y, par, k).wait()

    def in_copies(slot, z, y, p, k):
        return (pltpu.make_async_copy(snap_ref.at[slot],
                                      seg_box.at[p, pl.ds(k * BZ, BZ)],
                                      in_seg_sems.at[p, k]),
                pltpu.make_async_copy(
                    bins_in.at[pl.ds(z, BZ), pl.ds(y, R), :],
                    bin_box.at[p, pl.ds(k * BZ, BZ)],
                    in_bin_sems.at[p, k]))

    for k in range(NB):
        @pl.when((phase == 1) & (step == 0) & (slot_of(0, k) < nact))
        def _(k=k):
            z, y = tile_zy(slot_of(0, k))
            a, c = in_copies(slot_of(0, k), z, y, 0, k)
            a.start()
            c.start()

        # writeback of step-1's tile k completes before its buffer
        # region is reused by the step+1 prefetch just below
        @pl.when((phase == 1) & (step >= 1)
                 & (slot_of(step - 1, k) < nact))
        def _(k=k):
            pz, py = tile_zy(slot_of(step - 1, k))
            pltpu.make_async_copy(
                seg_box.at[1 - par, pl.ds(k * BZ + 1, TZ),
                           pl.ds(PADY, TY), :],
                seg_out.at[pl.ds(pz + 1, TZ), pl.ds(py + PADY, TY), :],
                out_sems.at[1 - par, k]).wait()

        @pl.when((phase == 1) & (slot_of(step + 1, k) < nact))
        def _(k=k):
            nz_, ny_ = tile_zy(slot_of(step + 1, k))
            a, c = in_copies(slot_of(step + 1, k), nz_, ny_, 1 - par, k)
            a.start()
            c.start()

    @pl.when((phase == 1) & (slot_of(step, 0) < nact))
    def _():
        for k in range(NB):
            @pl.when(slot_of(step, k) < nact)
            def _(k=k):
                z, y = tile_zy(slot_of(step, k))
                a, c = in_copies(slot_of(step, k), z, y, par, k)
                a.wait()
                c.wait()

        # int32 mask algebra throughout (3D i1 relayouts are fragile)
        segi = (seg_box[par] != 0).astype(jnp.int32)
        packed = bin_box[par]
        binv = packed & 255          # intensity bin
        inside = (packed >> 8) & 1   # inside-volume flag
        n27_in = packed >> 9         # 27-neighborhood inside count

        # per-tile interiors in box-local coordinates (static pattern);
        # invalid trailing slots of the final step fold into this mask,
        # so their stale buffer contents never reach flips/flags/acc
        liz = jax.lax.broadcasted_iota(jnp.int32, (NBZ, R, Xp), 0)
        liy = jax.lax.broadcasted_iota(jnp.int32, (NBZ, R, Xp), 1)
        in_y = ((liy >= PADY) & (liy < PADY + TY)).astype(jnp.int32)
        interior = jnp.zeros((NBZ, R, Xp), jnp.int32)
        for k in range(NB):
            tzm = ((liz >= k * BZ + 1)
                   & (liz < k * BZ + 1 + TZ)).astype(jnp.int32)
            vk = jnp.where(slot_of(step, k) < nact, 1, 0)
            interior = interior + tzm * vk
        interior = interior * in_y

        # boundary test from ONE separable neighbor sum: seg <= inside,
        # so sum27(unseg) = n27_in - sum27(seg)
        unseg = inside - segi
        n27_seg = _sum27(segi)
        inner_bnd = segi * jnp.where(n27_in - n27_seg - unseg > 0, 1, 0)
        outer_bnd = unseg * jnp.where(n27_seg - segi > 0, 1, 0)
        bnd = jnp.maximum(inner_bnd, outer_bnd) * interior

        # flip rule: sign of innerProbNorm - outerProbNorm at the
        # voxel's bin, unpacked from packed sign words (no gather)
        wsel = binv >> 5
        sel = jnp.zeros((NBZ, R, Xp), jnp.int32)
        for k in range(W):
            sel = jnp.where(wsel == k, words_ref[0, k], sel)
        ge = (sel >> (binv & 31)) & 1

        flips = bnd * jnp.bitwise_xor(segi, ge)
        seg_new = jnp.bitwise_xor(segi, flips)
        n_flips = jnp.sum(jnp.sum(flips, axis=0))

        for k in range(NB):
            sl = slice(k * BZ, (k + 1) * BZ)
            flags_ref[slot_of(step, k), 0] = jnp.sum(
                jnp.sum(flips[sl], axis=0))
            flags_ref[slot_of(step, k), 1] = jnp.max(
                jnp.max(bnd[sl], axis=0))

        seg_box[par] = seg_new.astype(jnp.uint8)
        # write back the interior rows; full-x rows are safe (the x halo
        # is global padding where flips are masked to zero).  The DMAs
        # are left in flight — waited at step+1 before this buffer
        # parity is reused, or by the end-of-grid drain below.
        for k in range(NB):
            @pl.when(slot_of(step, k) < nact)
            def _(k=k):
                z0k, y0k = tile_zy(slot_of(step, k))
                pltpu.make_async_copy(
                    seg_box.at[par, pl.ds(k * BZ + 1, TZ),
                               pl.ds(PADY, TY), :],
                    seg_out.at[pl.ds(z0k + 1, TZ),
                               pl.ds(y0k + PADY, TY), :],
                    out_sems.at[par, k]).start()

        # histogram delta of flipped voxels (+1 newly segmented, -1
        # newly unsegmented): static 8-row blocks, bins on sublanes of a
        # broadcast compare, blocks without flips skipped
        @pl.when(n_flips > 0)
        def _():
            sgn = (flips * (2 * seg_new - 1)).astype(jnp.float32)
            iota_b = jax.lax.broadcasted_iota(
                jnp.int32, (8, num_bins, Xp), 1)
            for kz in range(NB):
                for z in range(kz * BZ + 1, kz * BZ + 1 + TZ):
                    for r0 in range(PADY, PADY + TY, 8):
                        blk_b = binv[z, r0:r0 + 8, :]
                        blk_s = sgn[z, r0:r0 + 8, :]
                        blk_any = jnp.max(jnp.max(jnp.abs(blk_s),
                                                  axis=0))

                        @pl.when(blk_any > 0)
                        def _(blk_b=blk_b, blk_s=blk_s):
                            eq = (blk_b[:, None, :] == iota_b).astype(
                                jnp.float32)
                            acc[:] = acc[:] + jnp.sum(
                                eq * blk_s[:, None, :], axis=0)

    # end-of-grid drain: the final step's writebacks have no successor
    # step to wait them (they are waited at step+1 only when it exists)
    for k in range(NB):
        @pl.when((phase == 1) & (step == n_steps - 1)
                 & (slot_of(step, k) < nact))
        def _(k=k):
            z0k, y0k = tile_zy(slot_of(step, k))
            pltpu.make_async_copy(
                seg_box.at[par, pl.ds(k * BZ + 1, TZ),
                           pl.ds(PADY, TY), :],
                seg_out.at[pl.ds(z0k + 1, TZ),
                           pl.ds(y0k + PADY, TY), :],
                out_sems.at[par, k]).wait()

    @pl.when((phase == 1) & (step == n_steps - 1))
    def _():
        dhist_ref[:] = jnp.sum(acc[:], axis=1, keepdims=True)


def _pack_sign_words(diff, num_bins):
    """(diff >= 0) packed LSB-first into num_bins//32 int32 words.

    int32 throughout: the kernel extracts bits with an arithmetic shift
    followed by ``& 1``, which is sign-extension-proof."""
    bits = (diff >= 0).astype(jnp.int32)
    W = num_bins // 32
    return jnp.sum(bits.reshape(W, 32)
                   << jnp.arange(32, dtype=jnp.int32)[None, :],
                   axis=1, dtype=jnp.int32).reshape(1, W)


def _dilate_tiles(active_2d):
    """8-neighborhood + self dilation on the (ntz, nty) tile grid."""
    p = jnp.pad(active_2d, 1)
    out = active_2d
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            out = out | p[1 + dz:p.shape[0] - 1 + dz,
                          1 + dy:p.shape[1] - 1 + dy]
    return out


VMEM_BUDGET = 14 * 2 ** 20  # leave headroom under the 16 MiB scoped cap


def region_grow_frontier(
    data,
    seed_mask,
    H: float = DEFAULT_H,
    max_segment_size: int = DEFAULT_MAX_SEGMENT_SIZE,
    iter_max: int = DEFAULT_ITER_MAX,
    num_bins: int = 256,
    tile=(8, 16),
    k_max: int = 256,
    nb: int = 1,
    interpret: bool = False,
) -> RegionGrowResult:
    """Frontier-tile region growing (same fixed point as ``region_grow``
    with ``excluded_mask=None``).  ``nb`` tiles are batched per grid
    step (auto-clamped to the scoped-VMEM budget).

    ``nb`` defaults to 1: the r4 nb=4 batching was measured SLOWER on
    hardware (REVALIDATE_r05: 0.176 vs 0.147 s on the 512 bench
    workload, and 0.106 vs 0.110 on a straight tube — never better than
    ~4%), costs 2-4x the compile time (686 s vs 184 s cold at
    512x512x170), and crashes the remote AOT compiler at 512^3 shapes
    (HTTP 500).  Exact fixed-point parity between the two was verified
    on both workloads before flipping the default back."""
    assert num_bins % 32 == 0
    with _x32():
        return _region_grow_frontier_jit(
            jnp.asarray(data), jnp.asarray(seed_mask), float(H),
            int(max_segment_size), int(iter_max), int(num_bins),
            tuple(tile), int(k_max), int(nb), bool(interpret))


_JIT_STATICS = ("H", "max_segment_size", "iter_max", "num_bins", "tile",
                "k_max", "nb", "interpret")


@functools.partial(jax.jit, static_argnames=_JIT_STATICS)
def _region_grow_frontier_jit(data, seed_mask, H, max_segment_size,
                              iter_max, num_bins, tile, k_max, nb,
                              interpret):
    TZ, TY = tile
    assert TY % 8 == 0, "TY must be sublane-aligned"
    assert num_bins <= 256, "bin index must fit in the low byte"
    Z, Y, X = data.shape
    ntz = -(-Z // TZ)
    nty = -(-Y // TY)
    NT = ntz * nty
    k_max = min(k_max, NT)
    Zt, Yt = ntz * TZ, nty * TY

    data = data.astype(jnp.float32)
    seg0 = seed_mask.astype(jnp.bool_)
    bin_idx, bin_values = _quantize(data, num_bins)

    # one-time full-grid setup: histograms and the initial frontier
    hist_all = masked_histogram_one(
        bin_idx.reshape(-1), jnp.ones((Z * Y * X,), jnp.bool_),
        num_bins).astype(jnp.float32)
    inner_hist0 = masked_histogram_one(
        bin_idx.reshape(-1), seg0.reshape(-1), num_bins).astype(jnp.float32)

    bnd0 = (seg0 & dilate26(~seg0)) | ((~seg0) & dilate26(seg0))
    bnd_pad = jnp.zeros((Zt, Yt, X), jnp.bool_).at[:Z, :Y, :].set(bnd0)
    active0 = bnd_pad.reshape(ntz, TZ, nty, TY, X).any(axis=(1, 3, 4))

    # halo'd volumes: z halo 1, y halo PADY (aligned), x halo 1 then
    # padded up to a 128-lane multiple (HBM memrefs are lane-tiled and
    # partial-lane DMA slices are illegal); padding is "outside"
    Xp = -(-(X + 2) // 128) * 128
    seg_pad0 = jnp.zeros((Zt + 2, Yt + 2 * PADY, Xp), jnp.uint8)
    seg_pad0 = seg_pad0.at[1:Z + 1, PADY:PADY + Y, 1:X + 1].set(
        seg0.astype(jnp.uint8))
    # packed static geometry word per voxel: bits 0..7 intensity bin,
    # bit 8 inside-volume, bits 9..13 sum27(inside) — one-time setup so
    # the kernel never recomputes volume-border masks per tile.
    # (int32 wire: a uint8 bin wire was tried and lost — the in-kernel
    # int8->int32 relayout costs more than the DMA it saves)
    inside_pad = jnp.zeros((Zt + 2, Yt + 2 * PADY, Xp), jnp.int32)
    inside_pad = inside_pad.at[1:Z + 1, PADY:PADY + Y, 1:X + 1].set(1)
    n27_inside = inside_pad
    for axis in range(3):
        n27_inside = (n27_inside
                      + jnp.roll(n27_inside, 1, axis)
                      + jnp.roll(n27_inside, -1, axis))
    bins_pad = jnp.zeros((Zt + 2, Yt + 2 * PADY, Xp), jnp.int32)
    bins_pad = bins_pad.at[1:Z + 1, PADY:PADY + Y, 1:X + 1].set(bin_idx)
    bins_pad = bins_pad | (inside_pad << 8) | (n27_inside << 9)

    diff_bins = bin_values[:, None] - bin_values[None, :]
    K = (A_NORM * jnp.exp(-0.5 * H * diff_bins * diff_bins)).astype(
        jnp.float32)

    W = num_bins // 32
    BZ, R = TZ + 2, TY + 2 * PADY
    # clamp the tile batch to the scoped-VMEM budget: two parity pairs
    # of nb stacked boxes (u8 seg + i32 bins) plus the hist accumulator
    per_tile = 2 * BZ * R * Xp * (1 + 4)
    fixed = num_bins * Xp * 4
    nb = max(1, min(nb, (VMEM_BUDGET - fixed) // per_tile, k_max))
    k_steps = -(-k_max // nb)
    k_pad = k_steps * nb
    NBZ = nb * BZ
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(2, k_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, W), lambda p, i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((num_bins, 1), lambda p, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NBZ, R, Xp), jnp.uint8),   # parity pair
            pltpu.VMEM((2, NBZ, R, Xp), jnp.int32),   # parity pair
            pltpu.VMEM((num_bins, Xp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nb)),  # snapshots
            pltpu.SemaphoreType.DMA((2, nb)),  # seg inputs
            pltpu.SemaphoreType.DMA((2, nb)),  # bin inputs
            pltpu.SemaphoreType.DMA((2, nb)),  # writebacks
        ],
    )
    kernel = functools.partial(_frontier_kernel, TZ, TY, Xp, nty,
                               num_bins, nb)

    def launch(seg_pad, ids, nact, words):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(seg_pad.shape, jnp.uint8),
                jax.ShapeDtypeStruct((k_pad, BZ, R, Xp), jnp.uint8),
                jax.ShapeDtypeStruct((num_bins, 1), jnp.float32),
                jax.ShapeDtypeStruct((k_pad, 2), jnp.int32),
            ],
            input_output_aliases={2: 0},  # seg (after 2 prefetch args)
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(ids, nact, seg_pad, bins_pad, words)

    def cond(state):
        return state[-1] < 0

    def body(state):
        # unconditional launch (no lax.cond around the big buffer: the
        # in-place alias through a branch forces defensive copies).  The
        # size cap is checked AFTER the launch that crossed it — the
        # crossed state is final, so the next launch simply never runs.
        seg_pad, inner_hist, active, it, stop = state

        inner_size = jnp.maximum(jnp.sum(inner_hist), 1.0)
        outer_hist = hist_all - inner_hist
        outer_size = jnp.maximum(jnp.sum(outer_hist), 1.0)
        diff = (K @ inner_hist) / inner_size - (K @ outer_hist) / outer_size
        words = _pack_sign_words(diff, num_bins)

        active_flat = active.reshape(-1)
        n_active = jnp.sum(active_flat, dtype=jnp.int32)
        ids = jnp.nonzero(active_flat, size=k_pad, fill_value=0)[0]
        ids = ids.astype(jnp.int32)
        nact = jnp.minimum(n_active, k_max).reshape(1)

        seg_new, _, dhist, flags = launch(seg_pad, ids, nact, words)
        valid = (jnp.arange(k_pad, dtype=jnp.int32)
                 < nact[0]).astype(jnp.int32)
        nf = flags[:, 0] * valid
        hb = flags[:, 1] * valid
        total_flips = jnp.sum(nf)

        nf_t = jnp.zeros((NT,), jnp.int32).at[ids].max(nf)
        hb_t = jnp.zeros((NT,), jnp.int32).at[ids].max(hb)
        proc = jnp.zeros((NT,), jnp.int32).at[ids].max(valid)

        flipped = (nf_t > 0).reshape(ntz, nty)
        keep = (hb_t > 0).reshape(ntz, nty)
        unproc = (active_flat & (proc == 0)).reshape(ntz, nty)
        active_new = unproc | keep | _dilate_tiles(flipped)
        inner_new = inner_hist + dhist.reshape(-1)

        processed_all = n_active <= k_max
        converged = (total_flips == 0) & processed_all
        size_capped = (jnp.sum(inner_new).astype(jnp.int32)
                       >= max_segment_size)
        # iterations count applied updates only (the full-grid kernel and
        # the reference do not count the converged final check)
        it_new = it + jnp.where(converged, 0, 1)
        stop = jnp.where(converged & ~size_capped, 0,
                         jnp.where(size_capped, 1,
                                   jnp.where(it_new >= iter_max, 2, -1)))
        return (seg_new, inner_new, active_new, it_new,
                stop.astype(jnp.int32))

    # a seed already at/over the size cap never launches (reference
    # semantics: the capped state is returned unmodified)
    stop0 = jnp.where(jnp.sum(inner_hist0).astype(jnp.int32)
                      >= max_segment_size, 1, -1).astype(jnp.int32)
    state0 = (seg_pad0, inner_hist0, active0, jnp.zeros((), jnp.int32),
              stop0)
    seg_pad, inner_hist, active, it, stop = jax.lax.while_loop(
        cond, body, state0)

    seg = seg_pad[1:Z + 1, PADY:PADY + Y, 1:X + 1] != 0
    return RegionGrowResult(
        segmented_map=seg,
        active_map=jnp.ones_like(seg),
        iterations=it,
        segmented_count=jnp.sum(seg, dtype=jnp.int32),
        stop_reason=stop)
