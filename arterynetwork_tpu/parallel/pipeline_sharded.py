"""Sharded end-to-end mini pipeline (BASELINE configs 3/5 semantics).

Composes the volume stages over a spatial device mesh — vesselness,
threshold masks, variational region growing from strong seeds, and
subfield thinning all run sharded P("sx","sy") with GSPMD inserting the
halo collectives (parallel/halo.py documents the mechanism; every kernel
is pure shift/pad/slice so the implicit path is exact) — then crosses to
the host for graph extraction and finishes with the longitudinal
data-parallel flow solve batched over timesteps (the GBMTest5 axis,
fluidSimulation.py:2150-2301) sharded P("dp").

This is the composition the reference could not express at all: its
answer to large volumes was "split the volume manually and merge"
(README.md:65) and its longitudinal timesteps are solved serially.
Exact-equality tests against the single-device path are in
tests/test_parallel.py; the driver's multi-chip dryrun executes it on a
virtual mesh (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses
import numpy as np


def mini_pipeline_sharded(raw, mesh=None, axes=("sx", "sy"),
                          sigmas=(1.0, 2.0),
                          strong_fraction: float = 0.5,
                          n_timesteps: int = 8,
                          max_waves: int = 16,
                          region_grow_iters: int = 60,
                          run_thinning: bool = True):
    """Raw volume -> sharded vesselness/mask/grow/skeleton -> host graph
    -> dp-batched longitudinal solves.

    Returns a dict with the sharded-device artifacts (as numpy),
    the flow network, and the per-timestep pressure matrix.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..ops.region_grow import region_grow
    from ..ops.thinning import skeletonize
    from ..ops.vesselness import frangi_vesselness
    from .halo import make_volume_mesh

    if mesh is None:
        mesh = make_volume_mesh(axis_names=axes)
    spec = NamedSharding(mesh, P(*axes, None))

    # --- device stages, spatially sharded -----------------------------
    raw_sh = jax.device_put(jnp.asarray(np.asarray(raw, np.float32)), spec)
    v = frangi_vesselness(raw_sh, sigmas=tuple(sigmas))

    @jax.jit
    def strong_seeds(v):
        vmin = jnp.min(v)
        rng = jnp.max(v) - vmin
        return v > vmin + strong_fraction * rng

    seeds = strong_seeds(v)
    grown = region_grow(v, seeds, max_segment_size=10 ** 7,
                        iter_max=region_grow_iters)
    mask_sh = grown.segmented_map != 0
    if run_thinning:
        skel_sh = skeletonize(mask_sh, max_waves=max_waves)
    else:
        skel_sh = mask_sh

    # packed-bit wire for the bool volumes (32x less transfer than
    # np.asarray of the bool arrays on a tunneled device; free on a
    # locally-attached mesh)
    from ..utils.transfer import mask_to_host

    mask = mask_to_host(mask_sh)
    skel = mask_to_host(skel_sh)

    # --- host graph stage ---------------------------------------------
    from ..graphs.branch_attrs import compute_branch_attrs
    from ..graphs.segments import skeleton_to_segments
    from ..ops.native import edt_masked_native

    dt = edt_masked_native(mask) if mask.any() else np.zeros(
        mask.shape, np.float32)
    _, segments = skeleton_to_segments(skel, prune_min_length=2,
                                       build_graph=False)
    # vesselness stays f32 on the wire: the sharded==single-device tests
    # assert exact equality on it (an f16 wire would be 2x cheaper but
    # lossy; use utils.transfer.f16_to_host when exactness is not needed)
    result = {"vesselness": np.asarray(v), "mask": mask, "skeleton": skel,
              "segments": segments, "pressure_batch": None,
              "network": None}
    if not segments:
        return result
    attrs = compute_branch_attrs(segments, segments, dt)

    # --- flow: dp-batched longitudinal solve over timesteps ------------
    from ..flow import build_system, create_ground_truth
    from ..flow.solvers import solve_pressure_newton
    from ..graphs.soa_path import segments_to_flow_network

    counts = {}
    for seg in segments:
        for vx in (tuple(seg[0]), tuple(seg[-1])):
            counts[vx] = counts.get(vx, 0) + 1
    tips = [vx for vx, c in counts.items() if c == 1]
    root = min(tips) if tips else tuple(segments[0][0])
    from ..constants import DEFAULT_SPACING
    net, _ = segments_to_flow_network(segments, attrs, root,
                                      spacing=DEFAULT_SPACING)
    from ..flow.adan import set_network_ck
    net = set_network_ck(net)
    gt = create_ground_truth(net, option=2,
                             rng=np.random.default_rng(0))
    if not gt.success:
        return result
    system = build_system(net, boundary_pressure=gt.pressure,
                          dtype=jnp.float32)

    # timestep axis: boundary pressures scaled per timestep (the
    # longitudinal TP adjustment axis), sharded over all devices as dp
    dp_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("dp",))
    scales = jnp.linspace(1.0, 0.9, n_timesteps)
    batch = jnp.asarray(gt.pressure, jnp.float32)[None, :] * scales[:, None]
    batch = jax.device_put(batch, NamedSharding(dp_mesh, P("dp", None)))

    def one(bp):
        sys_t = dataclasses.replace(
            system,
            node_fixed_pressure=jnp.where(system.node_fixed, bp, 0.0))
        return solve_pressure_newton(sys_t, max_iter=30,
                                     linear_solver="cg").pressure

    pressures = jax.jit(
        jax.vmap(one),
        out_shardings=NamedSharding(dp_mesh, P("dp", None)))(batch)

    result["network"] = net
    result["pressure_batch"] = np.asarray(pressures)
    return result
