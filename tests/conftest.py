"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-device sharding tests use
XLA's host-platform device-count override (the standard JAX substitute
for a real multi-chip slice).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the ambient environment may pin a TPU-tunnel platform via sitecustomize,
# which overrides JAX_PLATFORMS; force the CPU backend explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
