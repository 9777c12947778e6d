"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip TPU hardware is not available in CI; sharding tests run against
``xla_force_host_platform_device_count=8`` CPU devices, the TPU-native
substitute for multi-node test rigs (SURVEY.md §4).

Note: this image's sitecustomize registers the tunneled-TPU ("axon") backend
and force-sets ``jax_platforms`` at interpreter start, so plain env vars are
not enough — we must override the jax config after import, before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Float64 on CPU lets oracle tests assert at 1e-12; TPU production paths are
# float32 and tested with looser tolerances.
jax.config.update("jax_enable_x64", True)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the exhaustive lane; the default "
             "fast lane keeps `pytest -q` under ~10 minutes)")


def pytest_collection_modifyitems(config, items):
    """Two test lanes: `pytest -q` (fast, default) skips tests marked slow;
    `pytest -q --runslow` or `pytest -q -m slow` runs the exhaustive lane."""
    if config.getoption("--runslow"):
        return
    if config.getoption("-m"):  # explicit marker selection overrides
        return
    import pytest

    skip_slow = pytest.mark.skip(reason="slow lane: use --runslow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
