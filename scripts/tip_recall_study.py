"""Thin-tip mask-recall study on the 512 bench phantom (TPU).

Sweeps the axial tip-extension knobs (pipeline._tip_extended_weak) and
the optional sigma=0.75 vesselness scale against the r4 baseline
(mask recall 0.958, terminals 174/202 on seed 0), printing one JSON
line per (config, seed).  Targets (VERDICT r4 #5): mask recall >= 0.97
and terminals >= 190/202 on seeds 0-4 with centerline precision
>= 0.985.

Usage: python scripts/tip_recall_study.py [--seeds 0,1,2] [--configs all]
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


def base_config():
    from arterynetwork_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.vesselness.sigmas = (1.0, 2.0, 3.0)
    cfg.vesselness.upload_format = "bq4"
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.weak_threshold_fraction = 0.03
    cfg.segmentation.border_margin_voxels = 6
    cfg.segmentation.min_component_size = 50
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4
    cfg.flow.dtype = "float32"
    cfg.flow.linear_solver = "auto"
    return cfg


CONFIGS = {
    "baseline": {},
    "tip_f01_i3_n4": {"tip": (0.01, 3, 4)},
    "tip_f01_i3_n2": {"tip": (0.01, 3, 2)},
    "tip_f01_i3_n6": {"tip": (0.01, 3, 6)},
    "tip_f005_i3_n4": {"tip": (0.005, 3, 4)},
    "tip_f02_i3_n4": {"tip": (0.02, 3, 4)},
    "tip_f01_i5_n4": {"tip": (0.01, 5, 4)},
    "sigma075": {"sigmas": (0.75, 1.0, 2.0, 3.0)},
    "sigma075_tip": {"sigmas": (0.75, 1.0, 2.0, 3.0),
                     "tip": (0.01, 3, 4)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--configs", default="all")
    ap.add_argument("--shape", default="512,512,170")
    ap.add_argument("--branches", type=int, default=400)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    names = (list(CONFIGS) if args.configs == "all"
             else args.configs.split(","))
    shape = tuple(int(s) for s in args.shape.split(","))

    from arterynetwork_tpu.pipeline import run_pipeline
    from arterynetwork_tpu.utils.fidelity import tree_recovery_metrics
    from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                                  vascular_tree_phantom)

    for seed in seeds:
        phantom = vascular_tree_phantom(shape, n_branches=args.branches,
                                        seed=seed)
        raw = phantom_raw_volume(phantom)
        for name in names:
            mods = CONFIGS[name]
            cfg = base_config()
            if "sigmas" in mods:
                cfg.vesselness.sigmas = mods["sigmas"]
            if "tip" in mods:
                (cfg.segmentation.tip_fraction,
                 cfg.segmentation.tip_iters,
                 cfg.segmentation.tip_neighbor_max) = mods["tip"]
            try:
                t0 = time.perf_counter()
                result = run_pipeline(raw_volume=raw, config=cfg)
                elapsed = time.perf_counter() - t0
                fid = tree_recovery_metrics(result["segments"],
                                            result["attrs"], phantom)
                rec = {
                    "config": name, "seed": seed,
                    "elapsed_s": round(elapsed, 2),
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
                    "gt_bifurcations": fid["gt_bifurcations"],
                }
            except Exception as e:
                rec = {"config": name, "seed": seed,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
