"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharded kernels are validated on
CPU with forced host platform device count (SURVEY.md §4.7).

Note: in this environment a sitecustomize registers the TPU backend at
interpreter start and pins JAX_PLATFORMS, so the env var alone is not
enough — we must override through jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
