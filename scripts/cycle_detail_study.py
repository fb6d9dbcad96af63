"""Per-cycle arc anatomy on the cached bifurcation-audit segments.

For every independent cycle surviving simplification, list each arc's
voxel length, mean radius, and mean/max distance of its interior voxels
to the GT centerlines — to test whether the kissing-artifact arc is
identifiable WITHOUT ground truth (shortest? thinnest? worst-covered?).

Usage: python scripts/cycle_detail_study.py [--seed 0]
(requires /tmp/bifaudit_seed{N}.pkl from bifurcation_audit_study.py)
"""

import argparse
import json
import pickle

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    with open(f"/tmp/bifaudit_seed{args.seed}.pkl", "rb") as f:
        payload = pickle.load(f)

    import networkx as nx
    from scipy.spatial import cKDTree

    segments = payload["segments"]
    attrs = payload["attrs"]
    gt_pts = np.concatenate(payload["centerlines"]).astype(np.float64)
    gt_tree = cKDTree(gt_pts)

    Gm = nx.MultiGraph()
    for i, s in enumerate(segments):
        Gm.add_edge(tuple(int(x) for x in s[0]),
                    tuple(int(x) for x in s[-1]), key=i)

    def arc_stats(i):
        pts = np.asarray(segments[i], np.float64)
        d = gt_tree.query(pts)[0]
        return {
            "arc": i, "len": len(pts),
            "r": round(float(attrs[i]["meanRadius"]), 2),
            "gt_mean": round(float(d.mean()), 2),
            "gt_max": round(float(d.max()), 2),
        }

    # minimum cycle basis on the simple graph, then add parallel-arc
    # and self-loop 2-cycles that the simple view hides
    Gs = nx.Graph()
    for u, v, k in Gm.edges(keys=True):
        if u == v:
            print(json.dumps({"cycle": "self", "arcs": [arc_stats(k)]}))
            continue
        if Gs.has_edge(u, v):
            ks = [kk for _, _, kk in Gm.edges(u, keys=True)
                  if (Gm.has_edge(u, v, kk))]
            print(json.dumps({"cycle": "parallel",
                              "arcs": [arc_stats(kk) for kk in ks]}))
        Gs.add_edge(u, v, key=k)

    for cyc in nx.cycle_basis(Gs):
        nodes = list(cyc)
        arcs = []
        nodeset = set(nodes)
        # collect arcs whose both endpoints are on the cycle and that
        # connect consecutive cycle nodes (approximate: any arc between
        # two cycle nodes)
        for u, v, k in Gm.edges(keys=True):
            if u in nodeset and v in nodeset and u != v:
                arcs.append(k)
        arcs = sorted(set(arcs))
        stats = [arc_stats(k) for k in arcs]
        stats.sort(key=lambda s: s["gt_mean"], reverse=True)
        print(json.dumps({"cycle_nodes": len(nodes),
                          "arcs": stats[:6],
                          "n_arcs": len(stats)}), flush=True)


if __name__ == "__main__":
    main()
