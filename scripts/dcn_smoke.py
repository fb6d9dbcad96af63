"""Two-process DCN smoke test on CPU (exercises parallel/distributed.py).

Launches itself twice (``--role child --process-id {0,1}``), each child
initializing ``jax.distributed`` against a local coordinator, building
the global dp mesh over 2 processes x 4 virtual CPU devices, and running
one batched flow solve sharded over the cross-process ``dp`` axis.  The
parent checks both children agree on the solution and exit cleanly.

This is the multi-host path the framework uses for longitudinal /
perturbation sweeps across hosts (parallel/distributed.py docstring);
the reference has no distributed backend at all (SURVEY.md §2), so the
contract being pinned is ours: process-spanning mesh + psum-backed
batched solves produce the single-process result bit-for-bit.

Usage:  python scripts/dcn_smoke.py            # parent: run the smoke
        python scripts/dcn_smoke.py --port N   # pick the coordinator port
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(process_id: int, num_processes: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from arterynetwork_tpu.parallel.distributed import (
        global_volume_mesh, initialize_distributed)

    n_global = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert n_global == 4 * num_processes, n_global

    mesh = global_volume_mesh(dp=num_processes)
    assert mesh.devices.shape[0] == num_processes

    # one batched solve sharded over the cross-process dp axis
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from arterynetwork_tpu.flow import build_system, create_ground_truth
    from arterynetwork_tpu.flow.solvers import solve_pressure_newton
    from arterynetwork_tpu.graphs import generate_tree, set_network_properties

    net = set_network_properties(
        generate_tree(max_depth=5, rng=np.random.default_rng(0)),
        k_value=1.852, rng=np.random.default_rng(0))
    gt = create_ground_truth(net, option=2, rng=np.random.default_rng(1))
    assert gt.success
    system = build_system(net, boundary_pressure=gt.pressure,
                          dtype=jnp.float64)

    B = 8  # batch of perturbed systems, sharded over all global devices
    import dataclasses

    scales = 1.0 + 0.01 * np.arange(B)
    dp_mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sharding = NamedSharding(dp_mesh, P("dp"))
    fixed = (jnp.asarray(system.node_fixed_pressure)[None, :]
             * scales[:, None])
    fixed = jax.device_put(fixed, sharding)

    def solve_one(fp):
        sol = solve_pressure_newton(
            dataclasses.replace(system, node_fixed_pressure=fp),
            max_iter=30, linear_solver="cg")
        return sol.pressure, sol.residual_norm

    pressures, residuals = jax.jit(jax.vmap(solve_one))(fixed)
    # gather across processes for the cross-check
    from jax.experimental import multihost_utils

    local = np.asarray(jax.device_get(
        multihost_utils.process_allgather(residuals, tiled=True)))
    p0 = np.asarray(jax.device_get(
        multihost_utils.process_allgather(pressures, tiled=True)))
    print(json.dumps({
        "process_id": process_id,
        "global_devices": n_global,
        "process_count": jax.process_count(),
        "max_residual": float(np.max(local)),
        "pressure_checksum": float(np.sum(p0)),
    }), flush=True)


def parent(port: int) -> int:
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--role", "child",
             "--process-id", str(pid), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    ok = True
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        line = [l for l in out.splitlines() if l.startswith("{")]
        outs.append(json.loads(line[-1]) if line else {"err": err[-500:]})
    agree = (len(outs) == 2 and "pressure_checksum" in outs[0]
             and "pressure_checksum" in outs[1]
             and outs[0]["pressure_checksum"] == outs[1]["pressure_checksum"]
             and outs[0]["max_residual"] < 1e-6)
    print(json.dumps({"section": "dcn_smoke", "ok": bool(ok and agree),
                      "children": outs}), flush=True)
    return 0 if (ok and agree) else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="parent")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)  # 0 = pick a free one
    args = ap.parse_args()
    if args.role == "child":
        child(args.process_id, 2, args.port)
    else:
        if args.port == 0:
            # OS-assigned free port: a hardcoded default collides with
            # concurrent runs or leaked children of an aborted one
            import socket
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                args.port = s.getsockname()[1]
        sys.exit(parent(args.port))


if __name__ == "__main__":
    main()
