"""Frontier-grower nb A/B on hardware: one (shape, nb) per process.

Usage: python scripts/frontier_ab.py Z Y X NB [ITERS] [straight|curved]
Prints one JSON line; run each config in its own process so a remote
compiler crash only loses that config.  ``curved`` reproduces bench.py's
_tube_phantom workload (298 iterations at 512x512x170).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    z, y, x, nb = map(int, sys.argv[1:5])
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 400
    kind = sys.argv[6] if len(sys.argv) > 6 else "straight"

    import jax
    import jax.numpy as jnp

    from arterynetwork_tpu.ops.region_grow_frontier import region_grow_frontier

    shape = (z, y, x)
    rng = np.random.default_rng(1)
    if kind == "curved":
        import bench
        vol, seed = bench._tube_phantom(shape)
    else:
        vol = rng.normal(0.1, 0.03, shape).astype(np.float32)
        zc, yc = shape[0] // 2, shape[1] // 2
        vol[zc - 3:zc + 3, yc - 3:yc + 3, 4:shape[2] - 4] += 0.8
        seed = np.zeros(shape, bool)
        seed[zc - 2:zc + 2, yc - 2:yc + 2,
             shape[2] // 2 - 4:shape[2] // 2 + 4] = True
    dvol, dseed = jnp.asarray(vol), jnp.asarray(seed)

    # curved reproduces bench_region_grow's exact call (bench.py)
    max_seg = 10 ** 6 if kind == "curved" else 10 ** 7

    def run():
        res = region_grow_frontier(dvol, dseed, nb=nb,
                                   max_segment_size=max_seg,
                                   iter_max=iters)
        it = int(jax.device_get(res.iterations))
        n = int(jax.device_get(res.segmented_count))
        return it, n

    t0 = time.perf_counter()
    it, n = run()
    t_cold = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        it, n = run()
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "section": "frontier_ab", "shape": [z, y, x], "nb": nb,
        "cold_s": round(t_cold, 4), "warm_s": round(sorted(ts)[1], 4),
        "runs": [round(t, 4) for t in ts],
        "iterations": it, "segmented": n}), flush=True)


if __name__ == "__main__":
    main()
