"""Sharded-kernel tests on the virtual 8-device CPU mesh (SURVEY.md §4.7:
exact equality vs the single-device reference)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from arterynetwork_tpu.ops.region_grow import region_grow
from arterynetwork_tpu.ops.stencil import dilate26
from arterynetwork_tpu.parallel.halo import (
    make_volume_mesh,
    shard_volume,
    sharded_dilate26,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_dilate_matches_single_device():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((32, 32, 24)) > 0.95)
    mesh = make_volume_mesh()
    sharded = shard_volume(mask, mesh)
    out_sharded = np.asarray(sharded_dilate26(sharded, mesh))
    out_single = np.asarray(dilate26(mask))
    np.testing.assert_array_equal(out_sharded, out_single)


def test_gspmd_region_grow_matches_single_device():
    """region_grow jitted over a sharded volume produces the identical
    voxel set (GSPMD inserts the halo collectives for the shifts)."""
    volume = np.zeros((32, 32, 64), dtype=np.float32)
    volume[14:18, 14:18, 8:56] = 1.0
    seed = np.zeros(volume.shape, bool)
    seed[15:17, 15:17, 30:33] = True

    single = np.asarray(region_grow(jnp.asarray(volume),
                                    jnp.asarray(seed)).segmented_map)

    mesh = make_volume_mesh()
    sh = NamedSharding(mesh, P("sx", "sy", None))
    vol_sh = jax.device_put(jnp.asarray(volume), sh)
    seed_sh = jax.device_put(jnp.asarray(seed), sh)
    res = region_grow(vol_sh, seed_sh)
    np.testing.assert_array_equal(np.asarray(res.segmented_map), single)


def test_batched_flow_solve_sharded_over_dp():
    """The longitudinal batch axis shards over the mesh (DP)."""
    from jax.sharding import Mesh

    from arterynetwork_tpu.flow import build_system, create_ground_truth
    from arterynetwork_tpu.flow.solvers import solve_pressure_newton
    from arterynetwork_tpu.graphs import generate_tree, set_network_properties
    import dataclasses

    rng = np.random.default_rng(0)
    net = set_network_properties(generate_tree(max_depth=5, rng=rng),
                                 rng=rng)
    gt = create_ground_truth(net, option=2, rng=rng)
    system = build_system(net, boundary_pressure=gt.pressure)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    scale = 1.0 + 0.01 * np.arange(8)
    batch = jnp.asarray(gt.pressure[None, :] * scale[:, None])
    batch = jax.device_put(batch, NamedSharding(mesh, P("dp", None)))

    def one(bp):
        sys_t = dataclasses.replace(
            system, node_fixed_pressure=jnp.where(system.node_fixed, bp, 0.0))
        return solve_pressure_newton(sys_t).pressure

    out = jax.jit(jax.vmap(one),
                  out_shardings=NamedSharding(mesh, P("dp", None)))(batch)
    out = np.asarray(out)
    assert out.shape == (8, net.num_nodes)
    # row 0 is the unscaled ground truth
    np.testing.assert_allclose(out[0], gt.pressure, rtol=1e-8, atol=1e-8)
    assert np.isfinite(out).all()


def test_sharded_vesselness_matches_single_device():
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness

    rng = np.random.default_rng(1)
    vol = rng.normal(0.1, 0.02, (32, 32, 24)).astype(np.float32)
    x, y = np.mgrid[:32, :32]
    tube = (x - 16) ** 2 + (y - 16) ** 2 <= 9
    vol[tube] = 1.0
    single = np.asarray(frangi_vesselness(jnp.asarray(vol), sigmas=(2.0,)))

    mesh = make_volume_mesh()
    sh = NamedSharding(mesh, P("sx", "sy", None))
    vol_sh = jax.device_put(jnp.asarray(vol), sh)
    out = np.asarray(frangi_vesselness(vol_sh, sigmas=(2.0,)))
    np.testing.assert_allclose(out, single, atol=1e-5, rtol=1e-4)


def test_sharded_edt_matches_single_device():
    from arterynetwork_tpu.ops.edt import edt

    rng = np.random.default_rng(2)
    mask = (rng.random((32, 32, 24)) < 0.7).astype(np.uint8)
    single = np.asarray(edt(jnp.asarray(mask), band=8))
    mesh = make_volume_mesh()
    sh = NamedSharding(mesh, P("sx", "sy", None))
    out = np.asarray(edt(jax.device_put(jnp.asarray(mask), sh), band=8))
    np.testing.assert_allclose(out, single, atol=1e-5)


def test_sharded_thinning_matches_single_device():
    """Subfield thinning jitted over a sharded volume peels the identical
    skeleton (GSPMD inserts the halo collectives; the 8-subfield parity
    decomposition is defined in global coordinates so the parallel-
    deletion guarantee is sharding-independent)."""
    from arterynetwork_tpu.ops.thinning import skeletonize

    vol = np.zeros((48, 48, 32), bool)
    z, y = np.mgrid[:48, :48]
    vol[(z - 20) ** 2 + (y - 20) ** 2 <= 12] = True
    vol[:, 22:26, 10:14] = True

    single = np.asarray(skeletonize(jnp.asarray(vol), max_waves=24))
    mesh = make_volume_mesh()
    sh = NamedSharding(mesh, P("sx", "sy", None))
    out = np.asarray(skeletonize(jax.device_put(jnp.asarray(vol), sh),
                                 max_waves=24))
    np.testing.assert_array_equal(out, single)


def test_mini_pipeline_sharded_end_to_end():
    """Composed sharded pipeline (vesselness -> seeds -> region grow ->
    thinning -> host graph -> dp-batched solves): device artifacts match
    the single-device composition exactly, and the timestep batch solves
    on the dp mesh."""
    from arterynetwork_tpu.ops.region_grow import region_grow
    from arterynetwork_tpu.ops.thinning import skeletonize
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness
    from arterynetwork_tpu.parallel.pipeline_sharded import (
        mini_pipeline_sharded)

    rng = np.random.default_rng(5)
    raw = rng.normal(100.0, 3.0, (48, 48, 32)).astype(np.float32)
    z, y = np.mgrid[:48, :48]
    raw[((z - 16) ** 2 + (y - 16) ** 2 <= 9)] += 80.0   # straight tube
    raw[((z - 32) ** 2 + (y - 30) ** 2 <= 4)] += 80.0   # thinner tube

    out = mini_pipeline_sharded(raw, sigmas=(1.5,), max_waves=12,
                                region_grow_iters=40)

    # single-device reference composition
    v1 = frangi_vesselness(jnp.asarray(raw), sigmas=(1.5,))
    vmin, vmax = float(jnp.min(v1)), float(jnp.max(v1))
    seeds = np.asarray(v1) > vmin + 0.5 * (vmax - vmin)
    grown = region_grow(v1, jnp.asarray(seeds), max_segment_size=10 ** 7,
                        iter_max=40)
    mask1 = np.asarray(grown.segmented_map) != 0
    skel1 = np.asarray(skeletonize(jnp.asarray(mask1), max_waves=12))

    np.testing.assert_array_equal(out["mask"], mask1)
    np.testing.assert_array_equal(out["skeleton"], skel1)
    assert out["segments"], "no segments extracted"
    if out["pressure_batch"] is not None:
        assert out["pressure_batch"].shape[0] == 8
        assert np.isfinite(out["pressure_batch"]).all()


def test_sharded_vesselness_blocked_banded_matches_single_device():
    """Sharded equality at an axis length that takes the block-banded
    contraction path (y >= _BLOCKED_MIN_N): the reshape/window/einsum
    chain must stay semantics-preserving under GSPMD partitioning."""
    from arterynetwork_tpu.ops import vesselness as V
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness

    rng = np.random.default_rng(7)
    vol = rng.normal(0.1, 0.02, (8, V._BLOCKED_MIN_N, 24)) \
        .astype(np.float32)
    vol[3:6, 180:200, 8:16] = 1.0
    single = np.asarray(frangi_vesselness(jnp.asarray(vol), sigmas=(2.0,)))

    mesh = make_volume_mesh()
    sh = NamedSharding(mesh, P("sx", "sy", None))
    out = np.asarray(frangi_vesselness(
        jax.device_put(jnp.asarray(vol), sh), sigmas=(2.0,)))
    np.testing.assert_allclose(out, single, atol=1e-5, rtol=1e-4)
