"""Multi-host (DCN) setup helpers.

The reference has no distributed backend at all (SURVEY.md §2: no
NCCL/MPI/Gloo; scale-out = "split the volume manually", README.md:65).
The TPU-native slots:

* intra-slice (ICI): the device mesh + GSPMD/shard_map collectives used by
  the voxel kernels and batched solves (parallel/halo.py);
* inter-host (DCN): ``jax.distributed`` process groups, wrapped here so a
  multi-host launch is one call per process.

Single-controller orchestration stays on host 0 (artifacts, graph surgery);
device computation spans the global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize the multi-host runtime (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  Returns the global device count.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return len(jax.devices())


def global_volume_mesh(axis_names: Sequence[str] = ("dp", "sx", "sy"),
                       dp: Optional[int] = None):
    """A dp x sx x sy mesh over all global devices.

    ``dp`` (longitudinal batch axis) defaults to the number of hosts so
    the batch axis rides DCN while the spatial halo exchanges of the
    volume shards stay on ICI within each host's slice.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if dp is None:
        dp = max(jax.process_count(), 1)
        while n % dp:
            dp -= 1
    rest = n // dp
    sx = int(np.floor(np.sqrt(rest)))
    while rest % sx:
        sx -= 1
    sy = rest // sx
    from jax.sharding import Mesh
    return Mesh(devices.reshape(dp, sx, sy), tuple(axis_names))
