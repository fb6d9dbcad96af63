"""Diagnose the residual bifurcation over-count on the 512 bench phantom.

The r5 tail (CLAUDE.md): 225 extracted junction vertices vs 198 GT
bifurcations at seed 0 — attributed to kissing-vessel mask merges
linking DIFFERENT ground-truth branches.  This study classifies every
extracted junction against the phantom's generating tree:

* matched      — within ``tol`` voxels of a GT bifurcation point
* artifact     — everything else, further split by
  - on_cycle    — the junction lies on a surviving graph cycle
                  (the GT is a tree, so any cycle is an artifact)
  - degree      — 3 (T-touch or spur) vs >=4 (X-crossing)
  - incident-arc stats (lengths, mean radii) for discriminator design

Runs the pipeline once per seed (TPU or CPU mesh), caches the segments
to ``/tmp/bifaudit_seed{N}.pkl`` so discriminator iterations can skip
the pipeline, and prints one JSON line per seed plus a per-junction
detail dump with ``--detail``.

Usage: python scripts/bifurcation_audit_study.py [--seeds 0] [--detail]
       [--cached]  # reuse the pickle, skip the pipeline
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def gt_bifurcation_points(phantom):
    """GT bifurcations = branch endpoints that spawn >=2 children
    (mirrors utils.fidelity.phantom_topology, but returns coordinates)."""
    starts = {}
    for c in phantom["centerlines"]:
        key = tuple(np.round(c[0]).astype(int))
        starts[key] = starts.get(key, 0) + 1
    pts = [e for e in {tuple(np.round(c[-1]).astype(int))
                       for c in phantom["centerlines"]}
           if starts.get(e, 0) >= 2]
    return np.asarray(pts, np.float64)


def run_or_load(seed, shape, branches, cached):
    cache = f"/tmp/bifaudit_seed{seed}.pkl"
    if cached and os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    from arterynetwork_tpu.config import PipelineConfig
    from arterynetwork_tpu.pipeline import run_pipeline
    from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                                  vascular_tree_phantom)
    phantom = vascular_tree_phantom(shape, n_branches=branches, seed=seed)
    raw = phantom_raw_volume(phantom)
    cfg = PipelineConfig()
    cfg.vesselness.sigmas = (0.75, 1.0, 2.0, 3.0)
    cfg.vesselness.upload_format = "bq4"
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.weak_threshold_fraction = 0.03
    cfg.segmentation.border_margin_voxels = 6
    cfg.segmentation.min_component_size = 50
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4
    cfg.flow.dtype = "float32"
    result = run_pipeline(raw_volume=raw, config=cfg)
    payload = {
        "segments": [np.asarray(s) for s in result["segments"]],
        "attrs": result["attrs"],
        "gt_bif": gt_bifurcation_points(phantom),
        "centerlines": [np.asarray(c) for c in phantom["centerlines"]],
        "radii": list(phantom["radii"]),
        "n_branches": int(phantom["n_branches"]),
    }
    with open(cache, "wb") as f:
        pickle.dump(payload, f)
    return payload


def audit(payload, tol=3.0, detail=False):
    import networkx as nx
    from scipy.spatial import cKDTree

    segments = payload["segments"]
    attrs = payload["attrs"]
    gt_bif = payload["gt_bif"]

    Gm = nx.MultiGraph()
    for i, s in enumerate(segments):
        Gm.add_edge(tuple(s[0]), tuple(s[-1]), key=i)
    junctions = [v for v in Gm.nodes if Gm.degree(v) >= 3]

    # cycle membership: nodes of every independent cycle
    cyc_nodes = set()
    for comp_cycle in nx.cycle_basis(nx.Graph(Gm)):
        cyc_nodes.update(comp_cycle)
    # parallel arcs (2-cycles) vanish in the simple-graph view
    seen = {}
    for u, v, k in Gm.edges(keys=True):
        e = (min(u, v), max(u, v))
        if e in seen:
            cyc_nodes.update([u, v])
        seen[e] = k
    # self loops
    for u, v, k in Gm.edges(keys=True):
        if u == v:
            cyc_nodes.add(u)

    tree = cKDTree(gt_bif) if len(gt_bif) else None
    rows = []
    for v in junctions:
        d = float(tree.query(np.asarray(v, np.float64))[0]) if tree else 1e9
        inc = [(k, len(segments[k]),
                float(attrs[k]["meanRadius"]))
               for _, _, k in Gm.edges(v, keys=True)]
        rows.append({
            "v": v, "deg": Gm.degree(v), "gt_dist": round(d, 2),
            "matched": d <= tol, "on_cycle": v in cyc_nodes,
            "arcs": inc,
        })

    n_cycles = (Gm.number_of_edges() - Gm.number_of_nodes()
                + nx.number_connected_components(Gm))
    art = [r for r in rows if not r["matched"]]
    summary = {
        "junctions": len(junctions),
        "gt_bifurcations": len(gt_bif),
        "matched": sum(r["matched"] for r in rows),
        "artifact": len(art),
        "artifact_on_cycle": sum(r["on_cycle"] for r in art),
        "artifact_deg3": sum(r["deg"] == 3 for r in art),
        "artifact_deg4plus": sum(r["deg"] >= 4 for r in art),
        "independent_cycles": int(n_cycles),
        # GT bifurcations missed entirely (no junction within tol)
        "gt_missed": (int((cKDTree(np.asarray(
            [r["v"] for r in rows], np.float64)).query(gt_bif)[0]
            > tol).sum()) if rows and len(gt_bif) else len(gt_bif)),
    }
    if detail:
        for r in sorted(art, key=lambda r: -r["deg"]):
            print(json.dumps({**r, "v": list(map(float, r["v"]))}),
                  flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--shape", default="512,512,170")
    ap.add_argument("--branches", type=int, default=400)
    ap.add_argument("--tol", type=float, default=3.0)
    ap.add_argument("--detail", action="store_true")
    ap.add_argument("--cached", action="store_true")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))
    for seed in [int(s) for s in args.seeds.split(",")]:
        payload = run_or_load(seed, shape, args.branches, args.cached)
        s = audit(payload, tol=args.tol, detail=args.detail)
        print(json.dumps({"seed": seed, **s}), flush=True)


if __name__ == "__main__":
    main()
