"""Branch attribute computation (reference C7: ``calculateBranchInfo``,
manualCorrectionGUI.py:215-415).

Given the cleaned segment list, the original (pre-cleaning) segment list,
and the vessel volume, compute per-branch attributes and per-node radii:

* per-centerpoint radius from the Euclidean distance transform of the
  vessel mask (cached by the caller if desired) —
  manualCorrectionGUI.py:243-249;
* per-branch ``meanRadius``/``sigma`` from the *interior* (degree-2)
  voxels that existed in the original skeleton
  (manualCorrectionGUI.py:268-311), with fallbacks:
  - zero-radius branches average the nonzero radii along the branch;
  - 2-voxel and brand-new branches average the neighbor branches' radii
    (manualCorrectionGUI.py:315-374);
* ``pathLength`` (sum of step lengths), ``eculideanLength`` (endpoint
  distance — the reference's attribute spelling is kept for artifact
  compatibility), ``tortuosity`` = path/euclidean, ``voxelLength``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import networkx as nx
import numpy as np
from numpy.linalg import norm

from ..ops.edt import edt


def _path_metrics(segment):
    arr = np.asarray(segment, dtype=float)
    steps = norm(arr[1:] - arr[:-1], axis=1)
    path_length = float(steps.sum())
    euclidean = float(norm(arr[-1] - arr[0]))
    tortuosity = path_length / euclidean if euclidean > 0 else 1.0
    return path_length, euclidean, tortuosity


def calculate_branch_info(segments_old: Sequence[Sequence],
                          segments_new: Sequence[Sequence],
                          vessel_volume=None,
                          distance_transform=None) -> nx.Graph:
    """Build the attributed voxel graph for ``segments_new``.

    Either ``vessel_volume`` (mask; EDT computed here) or a precomputed
    ``distance_transform`` must be given.
    """
    if distance_transform is None:
        if vessel_volume is None:
            raise ValueError("need vessel_volume or distance_transform")
        from ..ops.native import bounding_box

        vv = np.asarray(vessel_volume) != 0
        box = bounding_box(vv, margin=2)
        dt_full = np.zeros(vv.shape, np.float32)
        dt_full[box] = np.asarray(edt(vv[box]))
        distance_transform = dt_full
    dt = np.asarray(distance_transform)

    # index volume of the original skeleton (first segment index is 1,
    # manualCorrectionGUI.py:252-256)
    index_volume = np.zeros(dt.shape, dtype=np.int32)
    for i, seg in enumerate(segments_old):
        c = np.asarray(seg, dtype=np.int64)
        index_volume[tuple(c.T)] = i + 1

    G = nx.Graph()
    for seg in segments_new:
        nx.add_path(G, [tuple(v) for v in seg])

    short, new = [], []
    for idx, seg in enumerate(segments_new):
        seg = [tuple(int(x) for x in v) for v in seg]
        if len(seg) == 2:
            short.append((idx, seg))
            continue
        link = [v for v in seg
                if G.degree(v) == 2 and index_volume[v] != 0]
        if not link:
            new.append((idx, seg))
            continue
        coords = np.asarray(link, dtype=np.int64)
        radii = dt[tuple(coords.T)]
        mean_radius = float(radii.mean())
        sigma = float(radii.std())
        if mean_radius == 0:
            allr = dt[tuple(np.asarray(seg, np.int64).T)]
            nz = allr[allr != 0]
            if nz.size:
                mean_radius = float(nz.mean())
                sigma = float(nz.std())
        pl, el, tort = _path_metrics(seg)
        _set_branch(G, seg, idx, pl, el, tort, mean_radius, sigma=sigma)

    def _neighbor_radius(seg):
        head, tail = seg[0], seg[-1]
        hs = [G[head][v]["meanRadius"] for v in G.neighbors(head)
              if v != tail and "meanRadius" in G[head][v]]
        ts = [G[tail][v]["meanRadius"] for v in G.neighbors(tail)
              if v != head and "meanRadius" in G[tail][v]]
        h = float(np.mean(hs)) if hs else 0.0
        t = float(np.mean(ts)) if ts else 0.0
        if h and t:
            return (h + t) / 2.0
        return h or t or 0.0

    for idx, seg in short + new:
        mean_radius = _neighbor_radius(seg)
        pl = float(norm(np.asarray(seg[0], float) - np.asarray(seg[-1], float)))
        _set_branch(G, seg, idx, pl, pl, 1.0, mean_radius, sigma=None)

    for node in G.nodes():
        G.nodes[node]["radius"] = float(dt[node])
    return G


def _set_branch(G, seg, idx, path_length, euclidean, tortuosity,
                mean_radius, sigma=None):
    attrs = dict(pathLength=float(path_length),
                 eculideanLength=float(euclidean),
                 tortuosity=float(tortuosity),
                 voxelLength=int(len(seg)),
                 meanRadius=float(mean_radius),
                 segmentIndex=int(idx))
    if sigma is not None:
        attrs["sigma"] = float(sigma)
    for a, b in zip(seg[:-1], seg[1:]):
        G.add_edge(a, b, **attrs)
