"""CLI end-to-end tests (python -m arterynetwork_tpu ...)."""

import json
import os

import numpy as np

from arterynetwork_tpu.__main__ import main
from arterynetwork_tpu.io.nifti import load_volume, save_volume


def _phantom(tmp_path):
    shape = (36, 36, 48)
    rng = np.random.default_rng(2)
    raw = rng.normal(100.0, 3.0, shape).astype(np.float32)
    x, y = np.mgrid[: shape[0], : shape[1]]
    tube = (x - 18) ** 2 + (y - 18) ** 2 <= 9
    for z in range(6, 42):
        raw[:, :, z] += 120.0 * tube
    p = str(tmp_path / "raw.nii.gz")
    save_volume(raw, np.eye(4), p, astype=np.float32)
    return p


def test_cli_pipeline(tmp_path, capsys):
    raw = _phantom(tmp_path)
    out = str(tmp_path / "out")
    main(["pipeline", raw, "--out", out, "--raw", "--threshold", "0.3",
          "--skeleton-backend", "native"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["segments"] >= 1
    assert summary["network_edges"] >= 1
    assert os.path.exists(os.path.join(out, "fluidSimulationResult.pkl"))


def test_cli_vesselness(tmp_path, capsys):
    raw = _phantom(tmp_path)
    out = str(tmp_path / "vess.nii.gz")
    main(["vesselness", raw, out, "--sigmas", "2.0,3.0"])
    v, _ = load_volume(out)
    assert v.max() > 0.3


def test_cli_info(capsys):
    main(["info"])
    info = json.loads(capsys.readouterr().out)
    assert "devices" in info and info["backend"] in ("cpu", "tpu")


def test_cli_study_flow_split(tmp_path, capsys):
    from arterynetwork_tpu.__main__ import main
    main(["study", "flow_split", "--out", str(tmp_path),
          "--timesteps", "3", "--depth", "5"])
    out = json.loads(capsys.readouterr().out)
    assert out["failed_timesteps"] == []
    assert "terminating_pressures_mmhg" in out
    assert out["terminating_pressures_mmhg"]["shape"][1] == 3


def test_cli_study_gbm5(tmp_path, capsys):
    from arterynetwork_tpu.__main__ import main
    main(["study", "gbm5", "--out", str(tmp_path),
          "--timesteps", "3", "--depth", "5"])
    json.loads(capsys.readouterr().out)
    assert (tmp_path / "fluidSimulationResult_GBMTest5_Timestep=1_v1.pkl"
            ).exists()
    assert (tmp_path / "gbm5_network_t0.png").exists()


def test_cli_study_gbm5b(tmp_path, capsys):
    from arterynetwork_tpu.__main__ import main
    main(["study", "gbm5b", "--out", str(tmp_path),
          "--timesteps", "3", "--depth", "5"])
    out = json.loads(capsys.readouterr().out)
    assert out["success"]
    assert len(out["pressure_drop_change_per_partition"]) == 3
    # the shrunk compartment (P0) gets a positive adjustment by the end
    assert out["pressure_drop_change_per_partition"][-1]["P0"] > 0
    assert (tmp_path / "gbm5b_volumes.png").exists()


def test_cli_study_distribute(tmp_path, capsys):
    from arterynetwork_tpu.__main__ import main
    main(["study", "distribute", "--out", str(tmp_path), "--depth", "5"])
    out = json.loads(capsys.readouterr().out)
    assert "fractions" in out and "terminal_pressure_mmhg" in out


def test_cli_morpho(tmp_path, capsys):
    """morpho subcommand = graphRelated __main__ driver: builds the info
    bundle from pipeline artifacts, runs statistics + the figure suite."""
    raw = _phantom(tmp_path)
    out = str(tmp_path / "out_m")
    main(["pipeline", raw, "--out", out, "--raw", "--threshold", "0.3",
          "--skeleton-backend", "native"])
    capsys.readouterr()

    figs = str(tmp_path / "figs")
    main(["morpho", out, "--out", figs])
    res = json.loads(capsys.readouterr().out)
    stats = res["statisticsPerPartition"]
    assert "Overall" in stats and stats["Overall"]["numBranches"] >= 1
    assert set(res["statisticsPerPartition2"]) == {"PCA", "MCA", "ACA"}
    # bundle persisted under the reference names
    for name in ("segmentInfoDict.pkl", "nodeInfoDict.pkl",
                 "partitionInfo.pkl", "chosenVoxelsForPartition.pkl",
                 "segmentListCleaned.npz",
                 "graphRepresentationCleanedWithAdvancedInfo.graphml"):
        assert os.path.exists(os.path.join(out, name)), name
    ok = {k: v for k, v in res["figures"].items()
          if not str(v).startswith("FAILED")}
    for name in ("fig1", "fig5", "graphPerPartition2"):
        assert name in ok, res["figures"].get(name)
        assert os.path.getsize(ok[name]) > 1000

    # second invocation reuses the bundle (no rebuild) and still works
    main(["morpho", out, "--out", figs, "--no-figures"])
    res2 = json.loads(capsys.readouterr().out)
    assert res2["figures"] == {}
    assert "Overall" in res2["statisticsPerPartition"]


def test_cli_pipeline_hysteresis_flags(tmp_path, capsys):
    raw = _phantom(tmp_path)
    brain = str(tmp_path / "brain.nii.gz")
    b = np.zeros((36, 36, 48), np.uint8)
    b[2:34, 2:34, 2:46] = 1
    save_volume(b, np.eye(4), brain, astype=np.uint8)
    out = str(tmp_path / "out_h")
    main(["pipeline", raw, "--out", out, "--raw",
          "--threshold", "0.4", "--weak-threshold", "0.05",
          "--border-margin", "2", "--brain-mask", brain,
          "--sigmas", "1.5,2.5", "--skeleton-backend", "native"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["segments"] >= 1
    assert summary["mask_voxels"] > 0


def test_cli_study_dw_physics(tmp_path, capsys):
    """--physics dw runs a study on the laminar Darcy-Weisbach law (the
    reference's unfinished method='DW' branch, fluidSimulation.py:4692)."""
    from arterynetwork_tpu.__main__ import main
    main(["study", "flow_split", "--out", str(tmp_path),
          "--timesteps", "3", "--depth", "5", "--physics", "dw"])
    out = json.loads(capsys.readouterr().out)
    assert out["failed_timesteps"] == []
    # summarized array: pressures for all 3 timesteps, physical range
    assert out["node_pressures_mmhg"]["shape"][-1] == 3
    assert 0.0 < out["node_pressures_mmhg"]["mean"] < 130.0
