"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA_FLAGS before jax initializes, and select the CPU platform via
jax.config (the JAX_PLATFORMS env var is not honored when the axon TPU plugin
is registered — SURVEY §4: simulate multi-chip without a real TPU pod).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
