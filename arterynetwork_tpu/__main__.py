"""Command-line interface.

    python -m arterynetwork_tpu pipeline INPUT.nii.gz --out DIR [options]
    python -m arterynetwork_tpu vesselness INPUT.nii.gz OUTPUT.nii.gz
    python -m arterynetwork_tpu info

The reference's pipeline is a set of scripts edited by hand per run
(README.md:111-199); this CLI runs the same stages end-to-end from one
command with artifacts written in the reference's file layout.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_pipeline(args):
    import numpy as np

    from .config import PipelineConfig
    from .io.artifacts import ArtifactStore
    from .io.nifti import load_volume
    from .pipeline import run_pipeline

    volume, affine = load_volume(args.input)
    cfg = PipelineConfig()
    if args.threshold is not None:
        cfg.segmentation.global_threshold_fraction = args.threshold
    if args.weak_threshold is not None:
        cfg.segmentation.weak_threshold_fraction = args.weak_threshold
    cfg.segmentation.border_margin_voxels = args.border_margin
    if args.sigmas:
        cfg.vesselness.sigmas = tuple(float(x)
                                      for x in args.sigmas.split(","))
    cfg.skeleton.backend = args.skeleton_backend
    store = ArtifactStore(args.out)
    kwargs = {}
    if args.raw:
        kwargs["raw_volume"] = np.asarray(volume, np.float32)
    else:
        kwargs["vesselness"] = np.asarray(volume, np.float32)
    if args.brain_mask:
        kwargs["brain_mask"] = load_volume(args.brain_mask)[0] != 0
    result = run_pipeline(config=cfg, store=store, affine=affine, **kwargs)
    summary = {
        "mask_voxels": int(result["mask"].sum()),
        "skeleton_voxels": int(result["skeleton"].sum()),
        "segments": len(result["segments"]),
        "network_nodes": result["network"].num_nodes,
        "network_edges": result["network"].num_edges,
        "timings_s": result["timings"],
    }
    print(json.dumps(summary, indent=2))


def _cmd_vesselness(args):
    import numpy as np

    from .io.nifti import load_volume, save_volume
    from .ops.vesselness import frangi_vesselness

    volume, affine = load_volume(args.input)
    v = np.asarray(frangi_vesselness(
        np.asarray(volume, np.float32),
        sigmas=tuple(float(s) for s in args.sigmas.split(","))))
    save_volume(v, affine, args.output, astype=np.float32)
    print(f"wrote {args.output}")


def _cmd_study(args):
    """Run a longitudinal flow study (reference test1-6 / GBMTest4/5
    drivers) on a synthetic partitioned tree or a legacy network dir."""
    import numpy as np

    from .flow import (create_ground_truth, flow_split_study, gbm_test4,
                       same_flow_study, save_gbm_test5_results,
                       tp_fit_solve_study, two_timepoint_comparison)
    from .flow.boundary import bfs_partition
    from .graphs import generate_tree, set_network_properties
    from .io.artifacts import ArtifactStore

    rng = np.random.default_rng(args.seed)
    if args.network_dir:
        from .flow.network_setup import convert_network, load_network
        loaded = load_network(args.network_dir, version=args.version)
        net, _ = convert_network(loaded)
        roots = np.nonzero(net.node_depth == 1)[0][:2]
    else:
        net = set_network_properties(
            generate_tree(max_depth=args.depth, rng=rng), rng=rng)
        roots = np.nonzero(net.node_depth == 1)[0]
    partitions = {f"P{i}": {"start_nodes": [int(r)], "boundary_nodes": []}
                  for i, r in enumerate(roots)}

    radius_end = net.radius.copy()
    shrink_edges = bfs_partition(
        net, partitions[next(iter(partitions))]["start_nodes"],
        [])["visited_edges"]
    radius_end[shrink_edges] *= args.shrink

    store = ArtifactStore(args.out)
    common = dict(num_timesteps=args.timesteps,
                  interpolation_option=args.interpolation,
                  partitions=partitions)
    if args.name == "flow_split":
        out = flow_split_study(net, radius_end, **common)
    elif args.name == "same_flow":
        out = same_flow_study(net, radius_end, **common)
    elif args.name == "two_timepoint":
        out = two_timepoint_comparison(net, radius_end)
    elif args.name == "tp_fit":
        out = tp_fit_solve_study(net, radius_end, store=store, **common)
    elif args.name == "gbm4":
        out = gbm_test4(net, partitions=partitions,
                        partition_to_perturb=(next(iter(partitions)),),
                        store=store)
    elif args.name == "gbm5":
        import jax.numpy as jnp

        from .flow.longitudinal import run_longitudinal
        from .viz import show_result_gbm_test5

        gt = create_ground_truth(net, option=2, rng=rng)
        batch, sol = run_longitudinal(
            net, gt.pressure, radius_end, num_timesteps=args.timesteps,
            interpolation_option=args.interpolation,
            partitions=partitions, dtype=jnp.float64)
        save_gbm_test5_results(store, net, batch, sol)
        out = show_result_gbm_test5(store, net,
                                    num_timesteps=args.timesteps,
                                    partitions=partitions,
                                    out_dir=args.out)
    else:
        raise SystemExit(f"unknown study {args.name}")

    def _clean(v):
        if isinstance(v, dict):
            return {k: _clean(x) for k, x in v.items()}
        if isinstance(v, np.ndarray):
            return {"shape": list(v.shape),
                    "mean": float(np.nanmean(v)) if v.size else None}
        if isinstance(v, (list, tuple)):
            if len(v) > 12:
                return f"[{len(v)} items]"
            return [_clean(x) for x in v]
        if isinstance(v, (np.integer, np.floating)):
            return float(v)
        return v if isinstance(v, (int, float, str, bool, type(None))) \
            else str(type(v).__name__)

    print(json.dumps(_clean(dict(out)), indent=2, default=str))


def _cmd_info(_args):
    import jax

    from . import __version__

    print(json.dumps({
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="arterynetwork_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="volume -> graph -> flow")
    pp.add_argument("input")
    pp.add_argument("--out", required=True)
    pp.add_argument("--raw", action="store_true",
                    help="input is a raw MRA volume (compute vesselness)")
    pp.add_argument("--threshold", type=float, default=None,
                    help="strong threshold fraction "
                         "(generateVesselVolume.py:190 default 0.7)")
    pp.add_argument("--weak-threshold", type=float, default=None,
                    help="enable hysteresis segmentation: weak floor "
                         "fraction (components must contain a voxel "
                         "above --threshold)")
    pp.add_argument("--border-margin", type=int, default=0,
                    help="zero the response within N voxels of the "
                         "volume faces")
    pp.add_argument("--brain-mask", default=None,
                    help="brain mask NIfTI for near-boundary "
                         "suppression (generateVesselVolume.py:186-191)")
    pp.add_argument("--sigmas", default=None,
                    help="vesselness scales, e.g. 1.0,2.0,3.0 "
                         "(with --raw)")
    pp.add_argument("--skeleton-backend", default="auto",
                    choices=("auto", "jax", "native"))
    pp.set_defaults(fn=_cmd_pipeline)

    pv = sub.add_parser("vesselness", help="Frangi filter a volume")
    pv.add_argument("input")
    pv.add_argument("output")
    pv.add_argument("--sigmas", default="1.0,2.0,3.0")
    pv.set_defaults(fn=_cmd_vesselness)

    ps = sub.add_parser("study", help="longitudinal flow studies "
                        "(test1-6 / GBMTest4/5 drivers)")
    ps.add_argument("name", choices=("flow_split", "same_flow",
                                     "two_timepoint", "tp_fit", "gbm4",
                                     "gbm5"))
    ps.add_argument("--out", required=True)
    ps.add_argument("--timesteps", type=int, default=4)
    ps.add_argument("--interpolation", type=int, default=1,
                    help="1=linear, 2=tanh (fluidSimulation.py:3177-3190)")
    ps.add_argument("--shrink", type=float, default=0.85,
                    help="end-timepoint radius factor on one compartment")
    ps.add_argument("--depth", type=int, default=6,
                    help="synthetic tree depth when no --network-dir")
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--network-dir", default=None,
                    help="legacy pickle bundle directory (loadNetwork)")
    ps.add_argument("--version", type=int, default=4)
    ps.set_defaults(fn=_cmd_study)

    pi = sub.add_parser("info", help="backend/device info")
    pi.set_defaults(fn=_cmd_info)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
