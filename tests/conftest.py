"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; sharding tests use
XLA's host-platform device virtualization as recommended for multi-chip
JAX development.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# a pytest plugin (jaxtyping) imports jax before this conftest runs, so the
# env var alone is too late -- update the config directly (backends are not
# initialized yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests must be hermetic to persistent-cache state: XLA:CPU AOT entries
# written on a different host (this VM migrates) carry machine features
# the new host lacks, and loading/serializing them can SIGILL/segfault.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    The suite compiles hundreds of large march programs in one process;
    on the single-core CI host the accumulated XLA:CPU JIT state has
    produced mid-suite segfaults inside backend_compile_and_load (always
    ~110 tests in, never in isolation).  Releasing executables between
    modules keeps the live JIT footprint bounded.
    """
    yield
    import jax

    jax.clear_caches()
