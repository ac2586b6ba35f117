"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens
in bench.py, not in the test suite.

The axon PJRT plugin (registered by sitecustomize) sets
``jax_platforms="axon,cpu"`` at import time, which overrides the
JAX_PLATFORMS env var — so we must override the *config* back to cpu
here, before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
