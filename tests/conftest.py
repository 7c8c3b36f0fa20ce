"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding (mesh sweeps, data parallelism) is exercised without a
TPU pod by forcing the host platform to present 8 devices, per the build
plan in SURVEY.md §4.4.  Must run before jax initialises its backends.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The JAX_PLATFORMS env var is pinned to the TPU plugin in this image and
# ignores per-process overrides; the config key wins.
jax.config.update("jax_platforms", "cpu")

# This environment's XLA builds default to low (bf16-class) matmul precision
# even on CPU; tests verify math, so force full fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
