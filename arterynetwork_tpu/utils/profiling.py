"""Tracing and profiling utilities (SURVEY.md §5).

The reference's observability is wall-clock prints at entry points
(timeit.default_timer + function-name prints, e.g.
generateVesselVolume.py:139,227, graphRelated.py:414-431).  Here the same
role is filled by a structured stage timer plus hooks into jax.profiler
for on-device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def device_sync(x):
    """Synchronize on a device value.

    NOTE: on the axon TPU backend ``block_until_ready`` returns at enqueue
    time; only a device->host transfer truly synchronizes, so this fetches
    a value."""
    return jax.device_get(x)


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self):
        self.seconds: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                device_sync(sync_on)
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, dict]:
        return {name: {"seconds": self.seconds[name],
                       "calls": self.counts[name]}
                for name in self.seconds}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
