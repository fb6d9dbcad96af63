"""End-to-end pipeline: MRA volume in -> attributed graph + flow solution.

Orchestrates the reference's staged batch pipeline (SURVEY.md §1 data
flow) as callable stages with the same artifact contracts:

  vesselness volume
    -> vessel mask            (generate_vessel_mask; C2,
                               generateVesselVolume.py:138-228)
    -> [optional region grow] (segmentation refinement; C3)
    -> skeleton               (skeletonize; C4)
    -> segments + voxel graph (C5/C6, skeletonization.py:745-790)
    -> branch attributes      (C7, manualCorrectionGUI.py:215-415)
    -> partition + reduction  (C9/C12)
    -> FlowNetwork + solve    (C13-C17)

Each stage optionally persists its artifact through an ArtifactStore using
the reference's file names, giving file-granular checkpoint/resume
(SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import subprocess
import time
from typing import Dict, Optional

import numpy as np

from .config import PipelineConfig
from .ops.cc import drop_small_components
from .ops.edt import edt
from .ops.region_grow import region_grow
from .utils.hostmem import configure_host_allocator

# volume stages churn 100-200 MB numpy temporaries per call; keep them
# heap-resident so steady-state runs do not re-fault every page
configure_host_allocator()


_SCRATCH: Dict = {}


def _edt_scratch(shape):
    """Reusable float32 volume buffer (pipeline-internal; see the
    first-touch note at its call site).

    ALIASING: the native fast path's distance transform lives in this
    buffer (sqrt'd in place), so ``run_pipeline``/``graph_stage`` are
    non-reentrant with respect to it — a second run with the same box
    shape overwrites any dt reference a caller kept from the first run.
    The buffer is not part of the returned result dict; callers that
    need to retain the transform must copy it."""
    arr = _SCRATCH.get("edt")
    if arr is None or arr.shape != tuple(shape):
        arr = np.empty(shape, np.float32)
        _SCRATCH["edt"] = arr
    return arr


def _mask_scratch(shape):
    """Reusable uint8 full-frame mask buffer (same aliasing caveat as
    ``_edt_scratch``: the result dict's ``mask`` from a previous run with
    the same shape is overwritten by the next run)."""
    arr = _SCRATCH.get("mask")
    if arr is None or arr.shape != tuple(shape):
        arr = np.empty(shape, np.uint8)
        _SCRATCH["mask"] = arr
    return arr


@dataclasses.dataclass
class StageTimings:
    seconds: Dict[str, float] = dataclasses.field(default_factory=dict)

    def add(self, name, t):
        self.seconds[name] = self.seconds.get(name, 0.0) + t


import functools as _functools

import jax as _jax
import jax.numpy as _jnp


def _border_core(shape, margin: int):
    """Mask that is False within ``margin`` voxels of any volume face
    (the filter's boundary band is unreliable; analog of the reference's
    near-boundary suppression, generateVesselVolume.py:186-191)."""
    core = _jnp.zeros(shape, bool)
    return core.at[margin:-margin, margin:-margin, margin:-margin].set(True)


@_functools.partial(_jax.jit, static_argnames=("margin",))
def _threshold_plain(v, global_frac, margin=0):
    vmin = _jnp.min(v)
    rng = _jnp.max(v) - vmin
    keep = v > vmin + global_frac * rng
    if margin:
        keep = keep & _border_core(v.shape, margin)
    return keep


@_functools.partial(_jax.jit, static_argnames=("boundary_dist", "margin"))
def _threshold_with_brain(v, brain, global_frac, near_frac, boundary_dist,
                          margin=0):
    vmin = _jnp.min(v)
    rng = _jnp.max(v) - vmin
    keep = v > vmin + global_frac * rng
    dist = edt(brain != 0, band=int(boundary_dist) + 2)
    near = ((v <= vmin + near_frac * rng) & (dist <= boundary_dist))
    keep = keep & ~near
    if margin:
        keep = keep & _border_core(v.shape, margin)
    return keep


@_functools.lru_cache(maxsize=None)
def _pool2_matrix(n: int):
    """(ceil(n/2), n) 0/1 matrix summing index pairs (2i, 2i+1)."""
    import numpy as _np
    m = (n + 1) // 2
    P = _np.zeros((m, n), _np.float32)
    P[_np.arange(n) // 2, _np.arange(n)] = 1.0
    return P


_POOL_EINSUM = ("iz,zyx->iyx", "iy,zyx->zix", "ix,zyx->zyi")


def _any_pool2(m):
    """2x any-pooled mask, shape = ceil(shape / 2) (the wire format for
    hysteresis strong seeds: exact component selection at 1/8 the bits,
    ops/native.hysteresis_components_ds2_native).

    Pooling runs as three banded matmuls (the codebase's standard MXU
    idiom): a (.., 2, .., 2, .., 2) reshape materializes a pathological
    tiled layout on TPU (measured 64 B/element at Speck scale — an OOM),
    while the matmul keeps native layouts and handles odd extents."""
    out = m.astype(_jnp.bfloat16)  # 0/1 sums <= 2: exact in bf16
    for axis in range(3):
        P = _jnp.asarray(_pool2_matrix(out.shape[axis]),
                         _jnp.bfloat16)
        out = _jnp.einsum(_POOL_EINSUM[axis], P, out)
    return out > 0


@_functools.partial(_jax.jit, static_argnames=("iters", "nbr_max", "margin"))
def _tip_extended_weak(v, weak, vmin, rng, tip_frac, iters, nbr_max,
                       margin=0, exclude=None):
    """Axial tip extension of the weak mask (thin-tip recall recovery).

    The hysteresis weak floor loses the last voxels of radius-1..2
    branches: the Frangi response decays at a vessel END (the local
    structure is a half-line, and the blob penalty kicks in), so the
    tip falls below ``weak_frac`` while still carrying a clear ridge
    response.  Growing the whole weak mask into a lower floor is the
    measured-bad move (lateral halos distort radii and cost centerline
    recall — CLAUDE.md threshold sweep); instead this grows ONLY where
    the candidate voxel touches few mask voxels (``nbr_max``): an axial
    continuation beyond a tube end touches 1-4 mask voxels, a lateral
    halo voxel alongside the tube touches more.  ``iters`` bounds the
    extension length.  Runs before component selection, so noise-only
    growth stays unselected (no extra wire, no host round trip).

    ``vmin``/``rng`` come from the caller (already computed for the
    thresholds — no second pair of full-volume reductions); ``exclude``
    masks candidates out entirely (the brain path's near-boundary
    suppression must also bind the tip floor, or the extension would
    re-admit exactly the low-response boundary voxels it removed).
    """
    from .ops.stencil import neighbor_count26

    tip = v > vmin + tip_frac * rng
    if exclude is not None:
        tip = tip & ~exclude
    if margin:
        tip = tip & _border_core(v.shape, margin)
    m = weak
    for _ in range(iters):
        nc = neighbor_count26(m)
        m = m | (tip & (nc >= 1) & (nc <= nbr_max))
    return m


@_functools.partial(_jax.jit, static_argnames=("margin",))
def _threshold_hysteresis(v, vmin, rng, weak_frac, strong_frac, margin=0):
    """(weak mask, 2x-pooled strong mask) for hysteresis selection."""
    weak = v > vmin + weak_frac * rng
    strong = v > vmin + strong_frac * rng
    if margin:
        core = _border_core(v.shape, margin)
        weak = weak & core
        strong = strong & core
    return weak, _any_pool2(strong)


@_functools.partial(_jax.jit, static_argnames=("boundary_dist", "margin"))
def _threshold_hysteresis_brain(v, brain, vmin, rng, weak_frac,
                                strong_frac, near_frac, boundary_dist,
                                margin=0):
    """Brain variant; also returns the near-boundary suppression mask so
    downstream growth (tip extension) honors it."""
    dist = edt(brain != 0, band=int(boundary_dist) + 2)
    near = ((v <= vmin + near_frac * rng) & (dist <= boundary_dist))
    weak = (v > vmin + weak_frac * rng) & ~near
    strong = (v > vmin + strong_frac * rng) & ~near
    if margin:
        core = _border_core(v.shape, margin)
        weak = weak & core
        strong = strong & core
    return weak, _any_pool2(strong), near


def vesselness_stage(raw_volume, config: Optional[PipelineConfig] = None,
                     store=None, affine=None, timings=None):
    """Raw MRA volume -> Frangi vesselness (on-device; replaces the
    reference's external SlicerVMTK preprocessing, README.md:37-65).

    The quantized upload streams slab-by-slab overlapped with the first
    scale's pass (the wire is the stage bottleneck on a tunneled TPU),
    and the volume only ever exists on device in its padded chunked form
    — which also makes Speck-scale volumes fit without a staging copy.
    With a ``timings`` struct, the wire-bound and compute-bound phases
    are attributed separately (``vesselness_upload`` /
    ``vesselness_compute``) so a wire regression is distinguishable from
    a compute regression.
    """
    from .ops.vesselness import frangi_vesselness_streamed

    cfg = (config or PipelineConfig()).vesselness
    # raw MRA is ~12-bit, so the default wire format is packed 12-bit
    # fixed point (1.5 B/voxel), dequantized on device
    bits = {"bq2": 2, "bq3": 3, "bq4": 4, "u8": 8, "u12": 12,
            "f16": 16}[cfg.upload_format]
    v, t_up, t_comp = frangi_vesselness_streamed(
        raw_volume, sigmas=tuple(cfg.sigmas),
        alpha=cfg.alpha, beta=cfg.beta, gamma=cfg.gamma,
        bright=cfg.bright, bits=bits,
        fused_response=cfg.fused_response,
        skip_background=bool(cfg.upload_skip) and bits <= 4)
    if timings is not None:
        timings.add("vesselness_upload", t_up)
        timings.add("vesselness_compute", t_comp)
    if store is not None:
        store.save_nifti("vesselnessFiltered.nii.gz", np.asarray(v),
                         affine=affine, astype=np.float32)
    return v  # stays device-resident for the mask stage


def generate_vessel_mask(vesselness, brain_mask=None,
                         config: Optional[PipelineConfig] = None,
                         store=None, affine=None, timings=None):
    """Vesselness-filtered volume -> binary vessel mask (C2).

    Reference semantics (generateVesselVolume.py:186-199): zero voxels
    within ``boundary_distance_voxels`` of the brain-mask boundary whose
    vesselness is below ``near_boundary_fraction`` of the range; global
    threshold at ``global_threshold_fraction``; drop components smaller
    than ``min_component_size``.
    """
    import jax
    import jax.numpy as jnp

    cfg = (config or PipelineConfig()).segmentation

    v = jnp.asarray(np.asarray(vesselness, np.float32))         if not isinstance(vesselness, jax.Array) else vesselness
    margin = int(cfg.border_margin_voxels)
    # both masks cross back to the host as packed bits (32x less wire
    # than the f32 volume)
    from .utils.transfer import mask_to_host

    if cfg.weak_threshold_fraction is not None:
        # hysteresis: weak floor for connectivity, strong seeds against
        # noise; component selection is one native seeded flood fill.
        # The ds2 pooled-seed selection is exact only when the strong
        # mask is a subset of the weak mask, which the threshold
        # ordering guarantees — reject configs that break it.
        if cfg.weak_threshold_fraction > cfg.global_threshold_fraction:
            raise ValueError(
                "weak_threshold_fraction must be <= "
                "global_threshold_fraction (strong mask must be a "
                "subset of the weak mask for hysteresis selection)")
        vmin = jnp.min(v)
        rng = jnp.max(v) - vmin
        near = None
        if brain_mask is not None:
            brain = jnp.asarray(np.asarray(brain_mask))
            weak_d, strong_ds, near = _threshold_hysteresis_brain(
                v, brain, vmin, rng, cfg.weak_threshold_fraction,
                cfg.global_threshold_fraction, cfg.near_boundary_fraction,
                int(cfg.boundary_distance_voxels), margin)
        else:
            weak_d, strong_ds = _threshold_hysteresis(
                v, vmin, rng, cfg.weak_threshold_fraction,
                cfg.global_threshold_fraction, margin)
        if cfg.tip_fraction is not None:
            weak_d = _tip_extended_weak(
                v, weak_d, vmin, rng, cfg.tip_fraction,
                int(cfg.tip_iters), int(cfg.tip_neighbor_max), margin,
                exclude=near)
        from .utils.transfer import sparse_masks_to_host_packed

        # both masks cross as occupied 8x8x16-voxel blocks only (the
        # weak mask is ~7% block-occupied: ~8-10x less wire than the
        # dense packed download), batched so the pair costs two tunnel
        # roundtrips instead of four (~25 ms latency each); the packed
        # bytes feed the native selection directly (one LUT unpack in
        # C++ into a reused full-frame scratch — no host-side
        # unpack/copy chain)
        t0 = time.perf_counter()
        wp, sp = sparse_masks_to_host_packed([weak_d, strong_ds])
        if timings is not None:  # threshold compute + packed-mask wire
            timings.add("segmentation_download", time.perf_counter() - t0)
        t0 = time.perf_counter()
        try:
            from .ops.native import hysteresis_components_ds2_packed_native
            mask = hysteresis_components_ds2_packed_native(
                wp, weak_d.shape, sp,
                min_size=cfg.min_component_size,
                out=_mask_scratch(weak_d.shape))
        except (ImportError, OSError, subprocess.CalledProcessError):
            # no g++ toolchain: scipy label fallback (build/load errors
            # only — real native-path bugs must not be silently rerouted)
            from scipy import ndimage
            shape = weak_d.shape
            weak = np.unpackbits(wp)[:int(np.prod(shape))] \
                .reshape(shape).astype(bool)
            sshape = strong_ds.shape
            strong = np.unpackbits(sp)[:int(np.prod(sshape))] \
                .reshape(sshape).astype(bool)
            for ax in range(3):  # 2x-pooled seeds back to full frame
                strong = np.repeat(strong, 2, axis=ax)
            strong = strong[:shape[0], :shape[1], :shape[2]]
            labels, n = ndimage.label(weak, structure=np.ones((3, 3, 3),
                                                              bool))
            keep = np.unique(labels[strong & weak])
            keep = keep[keep > 0]
            if cfg.min_component_size and n:
                counts = np.bincount(labels.reshape(-1))
                # match the native drop rule exactly: size <= min_size
                # is dropped (strictly larger survives)
                keep = keep[counts[keep] > cfg.min_component_size]
            sel = np.zeros(n + 1, bool)
            sel[keep] = True
            mask = sel[labels].astype(np.uint8)
        if timings is not None:
            timings.add("segmentation_flood", time.perf_counter() - t0)
    else:
        if brain_mask is not None:
            brain = jnp.asarray(np.asarray(brain_mask))
            keep = _threshold_with_brain(
                v, brain, cfg.global_threshold_fraction,
                cfg.near_boundary_fraction,
                int(cfg.boundary_distance_voxels), margin)
        else:
            keep = _threshold_plain(v, cfg.global_threshold_fraction,
                                    margin)
        mask = mask_to_host(keep).astype(np.uint8)
        mask = drop_small_components(mask, threshold=cfg.min_component_size)

    if store is not None:
        store.save_nifti("vesselVolumeMask.nii.gz", mask,
                         affine=affine, astype=np.uint8)
    return mask


def refine_mask_region_grow(vesselness, seed_mask, config=None):
    """Optional variational refinement of the mask from seeds (C3)."""
    cfg = (config or PipelineConfig()).segmentation
    res = region_grow(np.asarray(vesselness, np.float32),
                      np.asarray(seed_mask, bool),
                      H=cfg.H, max_segment_size=cfg.max_segment_size,
                      iter_max=cfg.iter_max, num_bins=cfg.num_bins)
    return np.asarray(res.segmented_map).astype(np.uint8), res


def compute_mask_edt(mask):
    """Bounding-box-cropped EDT of the vessel mask (shared by
    skeletonization ordering and branch radius recovery — the reference
    also caches this array, manualCorrectionGUI.py:243-249).

    The mask lives on the host at this point (it just crossed as packed
    bits), and both consumers only read the transform AT vessel voxels,
    so the exact banded native EDT (sorted-offset scan, ops/native.py)
    avoids both a full-volume accelerator round trip and full-volume
    envelope passes.
    """
    from .ops.native import bounding_box, edt_masked_native

    vv = np.asarray(mask) != 0
    box = bounding_box(vv, margin=2)
    dt = np.zeros(vv.shape, np.float32)
    dt[box] = edt_masked_native(vv[box])
    return dt


def skeletonize_stage(mask, config=None, store=None, affine=None,
                      distance_transform=None):
    """Vessel mask -> centerline skeleton (C4)."""
    cfg = (config or PipelineConfig()).skeleton
    backend = cfg.backend
    if backend == "auto":
        # the sequential C++ worklist thinning is the fastest path at MRA
        # scale on every backend today; the JAX subfield kernel is the
        # device-resident alternative (and the one that shards)
        backend = "native"
    if backend == "native":
        from .ops.native import skeletonize_native
        skel = skeletonize_native(mask,
                                  preserve_endpoints=cfg.preserve_endpoints,
                                  distance_transform=distance_transform)
    else:
        from .ops.thinning import skeletonize
        skel = np.asarray(skeletonize(
            mask, max_waves=cfg.max_waves,
            preserve_endpoints=cfg.preserve_endpoints))
    if store is not None:
        store.save_nifti("skeleton.nii.gz", skel.astype(np.uint8),
                         affine=affine, astype=np.uint8)
    return skel


def graph_stage(skeleton, mask, config=None, store=None,
                distance_transform=None, build_nx: bool = True,
                origin=(0, 0, 0)):
    """Skeleton -> simple-branch segments + branch attributes (C5/C6/C7).

    Returns (G, segments, attrs).  ``build_nx=False`` skips the voxel-
    level networkx graph (G is None) — the SoA flow path and per-segment
    ``attrs`` carry everything the solve needs; the nx graph is only
    required for graphml artifacts, the editing engine and voxel-level
    morphology.

    ``skeleton`` and ``distance_transform`` may be box-cropped with
    ``origin`` = box start (the pipeline fast path); emitted segments
    always carry full-frame coordinates.
    """
    from .graphs.branch_attrs import calculate_branch_info, \
        compute_branch_attrs
    from .graphs.segments import skeleton_to_segments

    cfg = (config or PipelineConfig()).skeleton
    if distance_transform is None:
        # the EDT is computed full-frame here, so a box-cropped skeleton
        # (nonzero origin) without its matching cropped dt is not a
        # supported combination — the simplify radius lookup would index
        # the full-frame dt with box-frame keys; fail loudly instead
        if tuple(skeleton.shape) != tuple(np.asarray(mask).shape):
            raise ValueError(
                "graph_stage: cropped skeleton requires the matching "
                f"cropped distance_transform (skeleton {skeleton.shape} "
                f"vs mask {np.asarray(mask).shape})")
        distance_transform = compute_mask_edt(mask)
        origin = (0, 0, 0)
    _, segments = skeleton_to_segments(
        skeleton, prune_min_length=cfg.prune_min_length, build_graph=False,
        origin=origin, distance_transform=distance_transform,
        simplify=cfg.simplify,
        collapse=cfg.collapse_junctions,
        radius_factor=cfg.prune_radius_factor,
        cycle_tight_ratio=cfg.cycle_tight_ratio,
        simplify_rounds=cfg.simplify_rounds,
        bridge_max_len=cfg.bridge_max_len)
    attrs = compute_branch_attrs(segments, segments, distance_transform,
                                 origin=origin)
    G = None
    if build_nx or store is not None:
        dt_full = np.asarray(distance_transform)
        if any(origin):
            full = np.zeros(np.asarray(mask).shape, np.float32)
            sl = tuple(slice(int(o), int(o) + s)
                       for o, s in zip(origin, dt_full.shape))
            full[sl] = dt_full
            dt_full = full
        G = calculate_branch_info(segments, segments,
                                  distance_transform=dt_full)
    if store is not None:
        store.save_segment_list("segmentList.npz", segments)
        store.save_graphml("graphRepresentationCleanedWithEdgeInfo.graphml", G)
    return G, segments, attrs


def flow_stage_soa(segments, attrs, root, config=None, store=None,
                   boundary_pressure=None, ground_truth_option=2,
                   rng=None):
    """Segments + branch attrs -> FlowNetwork -> solved flows, without
    materializing the voxel-level networkx graph (graphs/soa_path.py)."""
    from .graphs.soa_path import segments_to_flow_network

    cfg = (config or PipelineConfig()).flow
    net, node_of = segments_to_flow_network(segments, attrs, root,
                                            spacing=cfg.spacing)
    return _solve_network(net, node_of, cfg, store=store,
                          boundary_pressure=boundary_pressure,
                          ground_truth_option=ground_truth_option, rng=rng)


def flow_stage(G, segments, root, config=None, store=None,
               boundary_pressure=None, ground_truth_option=2,
               rng=None):
    """Attributed voxel graph -> reduced FlowNetwork -> solved flows
    (C12-C17)."""
    from .graphs.traversal import (partition_bfs, reduce_graph,
                                   reduced_to_flow_network)

    cfg = (config or PipelineConfig()).flow
    partition_bfs(G, [root], [])
    # solve the connected component containing the root: drop segments the
    # BFS never reached (the reference also works per component,
    # graphRelated.py:93-95)
    reached = [i for i, seg in enumerate(segments)
               if all("depthLevel" in G.nodes[tuple(v)] for v in
                      (seg[0], seg[-1]))]
    DG = reduce_graph(G, segments, reached)
    net, node_of = reduced_to_flow_network(DG, root, spacing=cfg.spacing)
    return _solve_network(net, node_of, cfg, store=store,
                          boundary_pressure=boundary_pressure,
                          ground_truth_option=ground_truth_option, rng=rng)


def _solve_network(net, node_of, cfg, store=None, boundary_pressure=None,
                   ground_truth_option=2, rng=None):
    import jax.numpy as jnp

    from .flow import build_system, create_ground_truth, solve_pressure_newton
    from .flow.adan import set_network_ck

    net = set_network_ck(net)

    if boundary_pressure is None:
        gt = create_ground_truth(
            net, option=ground_truth_option,
            rng=rng or np.random.default_rng(0),
            inlet_pressure=cfg.inlet_pressure, inlet_flow=cfg.inlet_flow)
        if gt.success:
            boundary_pressure = gt.pressure
        else:
            # the depth sweep can be infeasible on loopy graphs (the
            # reference's documented failure mode, fluidSimulation.py:48-54,
            # 594-596); fall back to the ADAN path-length terminating-
            # pressure model, which is always well-defined — the Newton
            # solver handles loops exactly.
            from .flow.boundary import set_terminating_pressure

            term = net.terminal_nodes()
            parts = {"ALL": {"start_nodes": [int(n) for n in
                             net.entry_nodes], "boundary_nodes": []}}
            bp = set_terminating_pressure(
                net, parts, pressure_in=cfg.inlet_pressure * 0.95)
            bp[net.entry_nodes] = cfg.inlet_pressure
            # any unreached terminal: flat default
            bad = np.isnan(bp) & np.isin(np.arange(net.num_nodes),
                                         np.concatenate([term,
                                                         net.entry_nodes]))
            bp[bad & np.isnan(bp)] = cfg.inlet_pressure * 0.8
            boundary_pressure = bp

    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    system = build_system(net, boundary_pressure=boundary_pressure,
                          dtype=dtype)
    plan = None
    if cfg.linear_solver in ("auto", "tree"):
        from .flow.tree_solver import plan_elimination
        plan = plan_elimination(system)
    sol = solve_pressure_newton(system, max_iter=cfg.max_iter, tol=cfg.tol,
                                linear_solver=cfg.linear_solver, plan=plan,
                                restarts=cfg.restarts)
    # single device->host read: each transfer pays the ~25 ms tunnel
    # roundtrip regardless of size, so fetch the solution as one pytree
    pressure, flow, velocity = _jax.device_get(
        (sol.pressure, sol.flow, sol.velocity))
    net = net.replace(node_pressure=pressure, edge_flow=flow,
                      edge_velocity=velocity)
    if store is not None:
        store.save_pickle("fluidSimulationResult.pkl", {
            "pressure": pressure,
            "flow": flow,
            "velocity": velocity,
            "node_of": {str(k): int(v) for k, v in node_of.items()},
        })
    return net, sol, node_of


def run_pipeline(vesselness=None, brain_mask=None, seed_mask=None,
                 root=None, config: Optional[PipelineConfig] = None,
                 store=None, affine=None, raw_volume=None):
    """Full volume -> flow pipeline.  Returns a result dict with all
    intermediate artifacts and per-stage timings.

    Entry points: a raw MRA volume (``raw_volume``; vesselness computed
    on-device) or a pre-filtered vesselness volume (``vesselness``)."""
    config = config or PipelineConfig()
    timings = StageTimings()

    if vesselness is None:
        if raw_volume is None:
            raise ValueError("provide raw_volume or vesselness")
        t0 = time.perf_counter()
        vesselness = vesselness_stage(raw_volume, config, store=store,
                                      affine=affine, timings=timings)
        timings.add("vesselness", time.perf_counter() - t0)

    t0 = time.perf_counter()
    if seed_mask is not None:
        mask, _ = refine_mask_region_grow(vesselness, seed_mask, config)
    else:
        mask = generate_vessel_mask(vesselness, brain_mask, config,
                                    store=store, affine=affine,
                                    timings=timings)
    timings.add("segmentation", time.perf_counter() - t0)

    backend = config.skeleton.backend
    if backend == "auto":
        backend = "native"
    if backend == "native":
        # box-coordinate fast path: crop once after the mask, run EDT +
        # thinning + chain extraction on the cropped frame (squared EDT
        # end to end), and emit full-frame coordinates only at the
        # segment/skeleton boundaries
        from .ops.native import (bounding_box, edt_masked_native,
                                 skeletonize_native_cropped)

        t0 = time.perf_counter()
        # the mask stages emit uint8 0/1; bounding_box and the native
        # kernels read by truthiness, so no full-frame bool copy is made
        vv = np.asarray(mask)
        box = bounding_box(vv, margin=2)
        origin = tuple(int(s.start) for s in box)
        mask_box = np.ascontiguousarray(vv[box], np.uint8)
        if np.shares_memory(mask_box, vv):
            # a full-extent (or z-only) box keeps vv's own memory, and
            # the clobbering thinning below would silently turn the
            # returned mask into the skeleton
            mask_box = mask_box.copy()
        # the squared transform reuses a module-level scratch buffer: a
        # fresh >100 MB allocation is mmap'd and first-touched on every
        # run on this VM (seconds of page faults at MRA scale)
        d2_box = edt_masked_native(mask_box, squared=True,
                                   out=_edt_scratch(mask_box.shape))
        timings.add("edt", time.perf_counter() - t0)

        t0 = time.perf_counter()
        # mask_box is dead after thinning: clobber it in place (skips two
        # box-sized copies)
        skel_work = skeletonize_native_cropped(
            mask_box, d2_box,
            preserve_endpoints=config.skeleton.preserve_endpoints,
            clobber=True)
        dt = np.sqrt(d2_box, out=d2_box)  # thinning consumed the squares
        skeleton = np.zeros(vv.shape, bool)
        skeleton[box] = skel_work
        if store is not None:
            store.save_nifti("skeleton.nii.gz", skeleton.astype(np.uint8),
                             affine=affine, astype=np.uint8)
        timings.add("skeletonization", time.perf_counter() - t0)
    else:
        t0 = time.perf_counter()
        dt = compute_mask_edt(mask)
        origin = (0, 0, 0)
        timings.add("edt", time.perf_counter() - t0)

        t0 = time.perf_counter()
        skeleton = skeletonize_stage(mask, config, store=store,
                                     affine=affine, distance_transform=dt)
        skel_work = skeleton
        timings.add("skeletonization", time.perf_counter() - t0)

    t0 = time.perf_counter()
    G, segments, attrs = graph_stage(
        skel_work, mask, config, store=store, distance_transform=dt,
        build_nx=(config.flow.graph_path == "nx"), origin=origin)
    timings.add("graph", time.perf_counter() - t0)

    if root is None:
        # inlet = the lowest-x terminal endpoint (endpoint degree = its
        # chain-end count; 1 = tip)
        counts: Dict = {}
        for seg in segments:
            for v in (tuple(seg[0]), tuple(seg[-1])):
                counts[v] = counts.get(v, 0) + 1
        tips = [v for v, c in counts.items() if c == 1]
        if not tips:
            raise RuntimeError("no terminal voxels found for the inlet")
        root = min(tips, key=lambda v: v[2])

    t0 = time.perf_counter()
    if G is not None and config.flow.graph_path == "nx":
        net, sol, node_of = flow_stage(G, segments, root, config,
                                       store=store)
    else:
        net, sol, node_of = flow_stage_soa(segments, attrs, root, config,
                                           store=store)
    timings.add("flow", time.perf_counter() - t0)

    return {
        "mask": mask,
        "skeleton": skeleton,
        "graph": G,
        "attrs": attrs,
        "segments": segments,
        "network": net,
        "solution": sol,
        "node_of": node_of,
        "timings": timings.seconds,
    }
