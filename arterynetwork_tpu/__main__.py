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
    cfg.skeleton.backend = args.skeleton_backend
    store = ArtifactStore(args.out)
    kwargs = {}
    if args.raw:
        kwargs["raw_volume"] = np.asarray(volume, np.float32)
    else:
        kwargs["vesselness"] = np.asarray(volume, np.float32)
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
    pp.add_argument("--threshold", type=float, default=None)
    pp.add_argument("--skeleton-backend", default="auto",
                    choices=("auto", "jax", "native"))
    pp.set_defaults(fn=_cmd_pipeline)

    pv = sub.add_parser("vesselness", help="Frangi filter a volume")
    pv.add_argument("input")
    pv.add_argument("output")
    pv.add_argument("--sigmas", default="1.0,2.0,3.0")
    pv.set_defaults(fn=_cmd_vesselness)

    pi = sub.add_parser("info", help="backend/device info")
    pi.set_defaults(fn=_cmd_info)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
