"""Tree-recovery fidelity: the pipeline must reconstruct a known
vascular tree, not just run fast (BASELINE north star asks for
segmentation parity, not only <10 s).

Scores the hysteresis-segmentation pipeline against the generating
centerlines/radii of ``vascular_tree_phantom`` — the same metrics the
512 bench reports (utils/fidelity.py)."""

import numpy as np
import pytest

from arterynetwork_tpu.config import PipelineConfig
from arterynetwork_tpu.utils.fidelity import (phantom_topology,
                                              tree_recovery_metrics)
from arterynetwork_tpu.utils.phantoms import (phantom_raw_volume,
                                              vascular_tree_phantom)


def test_phantom_topology_counts():
    ph = vascular_tree_phantom((128, 128, 64), n_branches=30,
                               root_radius=4.0, seed=3)
    topo = phantom_topology(ph)
    # every branch either bifurcates or terminates; roots add ~4 extras
    assert topo["terminals"] + 2 * topo["bifurcations"] >= \
        ph["n_branches"] - 4
    assert topo["terminals"] >= 1 and topo["bifurcations"] >= 1


def test_tree_recovery_metrics_exact_on_ground_truth():
    """Feeding the generating centerlines back in scores ~perfectly."""
    ph = vascular_tree_phantom((96, 96, 48), n_branches=20,
                               root_radius=3.0, seed=1)
    segments = [np.round(c).astype(int) for c in ph["centerlines"]]
    attrs = [{"meanRadius": r} for r in ph["radii"]]
    m = tree_recovery_metrics(segments, attrs, ph)
    assert m["centerline_recall"] > 0.999
    assert m["centerline_precision"] > 0.999
    # junction points can match a rounded voxel of the adjacent
    # branch (different radius) within the tolerance
    assert m["radius_rmse"] < 0.2
    assert m["segment_count_ratio"] == 1.0


def test_pipeline_tree_recovery_small_phantom():
    """End-to-end (raw -> vesselness -> hysteresis mask -> skeleton ->
    graph -> flow) on a 40-branch phantom: recall >= 0.9, segment count
    <= 2x true branches (the 512 bench holds <= 1.5x; the small volume
    has proportionally more boundary effects)."""
    from arterynetwork_tpu.pipeline import run_pipeline

    shape = (192, 192, 96)
    ph = vascular_tree_phantom(shape, n_branches=40, root_radius=4.0,
                               branch_length=(15, 40), seed=0)
    raw = phantom_raw_volume(ph)

    cfg = PipelineConfig()
    cfg.vesselness.sigmas = (1.0, 2.0, 3.0)
    cfg.segmentation.global_threshold_fraction = 0.3
    cfg.segmentation.weak_threshold_fraction = 0.03
    cfg.segmentation.border_margin_voxels = 6
    cfg.segmentation.min_component_size = 50
    cfg.skeleton.backend = "native"
    cfg.skeleton.prune_min_length = 4
    cfg.flow.dtype = "float32"
    cfg.flow.linear_solver = "auto"

    result = run_pipeline(raw_volume=raw, config=cfg)
    mask_recall = float(result["mask"][ph["mask"]].astype(bool).mean())
    m = tree_recovery_metrics(result["segments"], result["attrs"], ph)

    assert mask_recall >= 0.9, mask_recall
    assert m["centerline_recall"] >= 0.9, m
    assert m["centerline_precision"] >= 0.9, m
    assert m["segment_count_ratio"] <= 2.0, m
    assert m["radius_rmse"] <= 1.0, m
    # junction-bridge audit keeps the bifurcation count near truth
    # (VERDICT r3 bar: <=1.25x; measured 1.00x here, 0.89-1.17x on
    # seeds 0-2 with centerline recall unchanged)
    assert m["bifurcations"] <= 1.25 * m["gt_bifurcations"], m
    assert result["network"].num_edges == len(result["segments"])
