"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
``xla_force_host_platform_device_count=8`` CPU devices, the TPU-native
substitute for multi-node test rigs (SURVEY.md §4). Must set env vars before
jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Float64 on CPU lets oracle tests assert at 1e-12; TPU production paths are
# float32 and tested with looser tolerances.
jax.config.update("jax_enable_x64", True)
