"""One-shot TPU re-validation sweep for the round-4 kernel batch.

Run this the moment the axon tunnel answers (after ``python bench.py``
has refreshed the canonical numbers).  Each section is independent and
prints one labeled JSON line; a section that faults the device or times
out can be skipped by name via --skip.

Covers the hardware proofs the CPU mesh cannot give:
  1. blocked-banded vesselness matmuls vs dense (timing + max|diff|)
     at 512 and Speck-slab shapes;
  2. frontier grower nb=1 vs nb=4 (timing + fixed-point equality) on
     the 512 tube benchmark;
  3. manual-DMA banded fused sweep at the Speck shape: does it compile
     through the remote AOT compiler inside a jitted driver loop, and
     does its fixed point match the XLA path?  (If yes, flip the auto
     dispatch in ops/region_grow_fused.py to use it above the VMEM
     budget.)
  4. fused Frangi response kernel (ops/vesselness_fused.py) vs the XLA
     apply path: compile, match, and beat.  (If yes, default
     cfg.vesselness.fused_response on.)

Usage:  python scripts/tpu_revalidate.py [--skip sec1,sec3] [--quick]
"""

import argparse
import functools
import json
import os
import sys
import time

# `python scripts/tpu_revalidate.py` puts scripts/ (not the repo root)
# on sys.path — bootstrap the package location explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    import jax
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _timed(fn, n=3):
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts), ts


def sec_vesselness(quick):
    import jax.numpy as jnp

    from arterynetwork_tpu.ops import vesselness as V

    rng = np.random.default_rng(0)
    shapes = [(68, 512, 512)] + ([] if quick else [(68, 880, 880)])
    for shape in shapes:
        vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        taps = tuple(np.asarray(V._gaussian_kernel(3.0, 0)).tolist())
        n = shape[2]
        B = jnp.asarray(V._banded_conv_matrix(taps, n))
        Mb = V._block_banded_matrix(("conv", taps), n)

        import jax

        dense_f = jax.jit(lambda v: jnp.einsum(
            V._AXIS_EINSUM[2], B, v,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
        blk_f = jax.jit(lambda v: V._apply_blocked(v, Mb, 2, n))
        d, td, _ = _timed(lambda: dense_f(vol))
        b, tb, _ = _timed(lambda: blk_f(vol))
        diff = float(jnp.max(jnp.abs(d - b)))
        print(json.dumps({
            "section": "vesselness_blocked", "shape": list(shape),
            "dense_s": td, "blocked_s": tb, "speedup": td / tb,
            "max_abs_diff": diff}), flush=True)

        # full-scale apply (what the pipeline actually runs)
        for sig in (1.0, 3.0):
            sm_f = jax.jit(functools.partial(V._smooth, sigma=sig))
            _, t, _ = _timed(lambda: sm_f(vol), n=2)
            print(json.dumps({
                "section": "vesselness_smooth", "shape": list(shape),
                "sigma": sig, "smooth_s": t}), flush=True)


def sec_frontier(quick):
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.region_grow_frontier import \
        region_grow_frontier

    shape = (256, 256, 128) if quick else (512, 512, 512)
    rng = np.random.default_rng(1)
    vol = rng.normal(0.1, 0.03, shape).astype(np.float32)
    zc, yc = shape[0] // 2, shape[1] // 2
    vol[zc - 3:zc + 3, yc - 3:yc + 3, 4:shape[2] - 4] += 0.8
    seed = np.zeros(shape, bool)
    seed[zc - 2:zc + 2, yc - 2:yc + 2,
         shape[2] // 2 - 4:shape[2] // 2 + 4] = True
    dvol, dseed = jnp.asarray(vol), jnp.asarray(seed)

    results = {}
    for nb in (1, 4):
        def run(nb=nb):
            return region_grow_frontier(dvol, dseed, nb=nb,
                                        max_segment_size=10 ** 7,
                                        iter_max=400)
        res, t, ts = _timed(run, n=3)
        results[nb] = (np.asarray(res.segmented_map), t,
                       int(res.iterations))
    equal = bool((results[1][0] == results[4][0]).all())
    print(json.dumps({
        "section": "frontier_nb", "shape": list(shape),
        "nb1_s": results[1][1], "nb4_s": results[4][1],
        "speedup": results[1][1] / results[4][1],
        "iterations": results[4][2], "fixed_point_equal": equal}),
        flush=True)


def sec_banded_sweep(quick):
    import jax.numpy as jnp

    import functools

    from arterynetwork_tpu.ops.region_grow import region_grow as _rg
    from arterynetwork_tpu.ops.region_grow_fused import region_grow_fused

    # above the tile budget "auto" falls back to XLA until the compiled
    # DMA-banded variant is proven — which is exactly this section's job
    region_grow = functools.partial(_rg, backend="xla")

    shape = (440, 440, 320) if quick else (880, 880, 640)
    rng = np.random.default_rng(2)
    vol = rng.normal(0.1, 0.03, shape).astype(np.float32)
    zc, yc = shape[0] // 2, shape[1] // 2
    vol[zc - 3:zc + 3, yc - 3:yc + 3, 8:shape[2] - 8] += 0.8
    seed = np.zeros(shape, bool)
    seed[zc - 2:zc + 2, yc - 2:yc + 2,
         shape[2] // 2 - 4:shape[2] // 2 + 4] = True
    dvol, dseed = jnp.asarray(vol), jnp.asarray(seed)

    ref = region_grow(dvol, dseed, max_segment_size=10 ** 7, iter_max=300)
    _sync(ref.segmented_map)
    t0 = time.perf_counter()
    ref = region_grow(dvol, dseed, max_segment_size=10 ** 7, iter_max=300)
    _sync(ref.segmented_map)
    t_xla = time.perf_counter() - t0

    t0 = time.perf_counter()
    fused = region_grow_fused(dvol, dseed, max_segment_size=10 ** 7,
                              iter_max=300)
    _sync(fused.segmented_map)
    t_compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    fused = region_grow_fused(dvol, dseed, max_segment_size=10 ** 7,
                              iter_max=300)
    _sync(fused.segmented_map)
    t_fused = time.perf_counter() - t0
    equal = bool((np.asarray(ref.segmented_map)
                  == np.asarray(fused.segmented_map)).all())
    print(json.dumps({
        "section": "banded_sweep_speck", "shape": list(shape),
        "xla_s": t_xla, "fused_warm_s": t_fused,
        "fused_cold_s": t_compile_and_run,
        "speedup": t_xla / t_fused, "fixed_point_equal": equal}),
        flush=True)


def sec_fused_response(quick):
    """Does the fused Hessian+eigen+response kernel compile through the
    remote AOT compiler, match the XLA apply path, and beat it?"""
    import jax
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.vesselness import (_hessian_from_smoothed,
                                                  _response_from_hessian,
                                                  _smooth)
    from arterynetwork_tpu.ops.vesselness_fused import \
        frangi_response_fused

    rng = np.random.default_rng(3)
    shapes = [(68, 512, 512)] + ([] if quick else [(68, 880, 880)])
    for shape in shapes:
        vol = jnp.asarray(rng.normal(0.1, 0.05, shape).astype(np.float32))
        sm = _smooth(vol, 2.0)
        _sync(sm)

        xla_f = jax.jit(lambda s: _response_from_hessian(
            _hessian_from_smoothed(s, 2.0), 0.5, 0.5, 0.7, True))
        a, t_xla, _ = _timed(lambda: xla_f(sm))
        b, t_fused, _ = _timed(
            lambda: frangi_response_fused(sm, 2.0, 0.7))
        diff = float(jnp.max(jnp.abs(a - b)))
        print(json.dumps({
            "section": "fused_response", "shape": list(shape),
            "xla_s": t_xla, "fused_s": t_fused,
            "speedup": t_xla / t_fused, "max_abs_diff": diff}),
            flush=True)


SECTIONS = {"vesselness": sec_vesselness, "frontier": sec_frontier,
            "banded_sweep": sec_banded_sweep,
            "fused_response": sec_fused_response}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    only = set(filter(None, args.only.split(",")))

    import jax
    devs = jax.devices()
    print(json.dumps({"section": "devices",
                      "devices": [str(d) for d in devs]}), flush=True)

    for name, fn in SECTIONS.items():
        if name in skip or (only and name not in only):
            continue
        try:
            fn(args.quick)
        except Exception as e:  # keep going; a faulted section is data too
            print(json.dumps({"section": name,
                              "error": f"{type(e).__name__}: {e}"[:500]}),
                  flush=True)
            sys.stdout.flush()


if __name__ == "__main__":
    main()
