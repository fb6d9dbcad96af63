"""Occupancy-skipped upload A/B on TPU (VERDICT r4 #10).

A: the bench's 512 pipeline config (bq4 wire) with upload_skip off/on,
   full fidelity metrics per seed — proves the skip is fidelity-neutral.
B: Speck-scale vesselness stage (bq3 wire) off/on — proves the wire win
   where it matters (upload was 5.0 s of the 13.6 s Speck e2e in r4).

One JSON line per record -> check in as UPLOADSKIP_r05.jsonl.

Usage: python scripts/upload_skip_ab.py [--seeds 0,1,2] [--skip-speck]
"""

import argparse
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


def bench_512_config(skip):
    from arterynetwork_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.vesselness.sigmas = (0.75, 1.0, 2.0, 3.0)
    cfg.vesselness.upload_format = "bq4"
    cfg.vesselness.upload_skip = skip
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.weak_threshold_fraction = 0.03
    cfg.segmentation.border_margin_voxels = 6
    cfg.segmentation.min_component_size = 50
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4
    cfg.flow.dtype = "float32"
    cfg.flow.linear_solver = "auto"
    return cfg


def run_512(seeds):
    from arterynetwork_tpu.pipeline import run_pipeline
    from arterynetwork_tpu.utils.fidelity import tree_recovery_metrics
    from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                                  vascular_tree_phantom)

    for seed in seeds:
        phantom = vascular_tree_phantom((512, 512, 170), n_branches=400,
                                        seed=seed)
        raw = phantom_raw_volume(phantom)
        for skip, rep in [(False, 0), (False, 1), (True, 0), (True, 1)]:
            try:
                t0 = time.perf_counter()
                result = run_pipeline(raw_volume=raw,
                                      config=bench_512_config(skip))
                elapsed = time.perf_counter() - t0
                fid = tree_recovery_metrics(result["segments"],
                                            result["attrs"], phantom)
                tm = result["timings"]
                rec = {
                    "section": "512", "seed": seed, "skip": skip,
                    "rep": rep,
                    "elapsed_s": round(elapsed, 2),
                    "upload_s": round(tm.get("vesselness_upload", -1), 3),
                    "compute_s": round(tm.get("vesselness_compute", -1), 3),
                    "mask_recall": round(float(
                        result["mask"][phantom["mask"]]
                        .astype(bool).mean()), 4),
                    "mask_voxels": int(result["mask"].sum()),
                    "segments": len(result["segments"]),
                    "centerline_recall": round(fid["centerline_recall"], 4),
                    "centerline_precision": round(
                        fid["centerline_precision"], 4),
                    "radius_rmse": round(fid["radius_rmse"], 3),
                    "terminals": fid["terminals"],
                    "gt_terminals": fid["gt_terminals"],
                    "bifurcations": fid["bifurcations"],
                }
            except Exception as e:
                rec = {"section": "512", "seed": seed, "skip": skip,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec), flush=True)


def run_speck():
    from arterynetwork_tpu.ops.vesselness import frangi_vesselness_streamed
    from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                                  vascular_tree_phantom)

    phantom = vascular_tree_phantom((880, 880, 640), n_branches=800, seed=0)
    raw = phantom_raw_volume(phantom)
    del phantom
    for skip in (False, True):
        for rep in range(3):
            try:
                t0 = time.perf_counter()
                v, t_up, t_comp = frangi_vesselness_streamed(
                    raw, sigmas=(1.0, 2.0, 3.0), bits=3,
                    skip_background=skip)
                elapsed = time.perf_counter() - t0
                vmax = float(np.asarray(v[:1, :1, :8]).max())  # tiny sync
                del v
                rec = {"section": "speck_vesselness", "skip": skip,
                       "rep": rep, "elapsed_s": round(elapsed, 2),
                       "upload_s": round(t_up, 2),
                       "compute_s": round(t_comp, 2),
                       "probe": round(vmax, 6)}
            except Exception as e:
                rec = {"section": "speck_vesselness", "skip": skip,
                       "rep": rep,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--skip-512", action="store_true")
    ap.add_argument("--skip-speck", action="store_true")
    args = ap.parse_args()
    if not args.skip_512:
        run_512([int(s) for s in args.seeds.split(",")])
    if not args.skip_speck:
        run_speck()


if __name__ == "__main__":
    main()
