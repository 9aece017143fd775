"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; sharding tests use
XLA's host-platform device virtualization as recommended for multi-chip
JAX development.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
