"""Multi-process (DCN) smoke test for parallel/distributed.py.

Launches scripts/dcn_smoke.py, which spawns TWO local processes, each
with 4 virtual CPU devices, initializes jax.distributed against a local
coordinator, builds the cross-process dp mesh, and runs one batched
flow solve sharded over it.  This exercises the inter-host path the
single-process CPU-mesh tests cannot (process_count() == 2, cross-host
collectives through the distributed runtime).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    """OS-assigned free port (a hardcoded one collides with concurrent
    runs or leaked children from an aborted previous run)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_solve():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dcn_smoke.py"),
         "--port", str(_free_port())],
        capture_output=True, text=True, timeout=420)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, (out.stdout[-500:], out.stderr[-500:])
    rec = json.loads(lines[-1])
    assert rec["ok"], rec
    c0, c1 = rec["children"]
    assert c0["process_count"] == 2 and c0["global_devices"] == 8
    assert c0["pressure_checksum"] == c1["pressure_checksum"]
    assert c0["max_residual"] < 1e-9
