"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding paths are validated on a fake CPU mesh
(``--xla_force_host_platform_device_count``); real-TPU execution is
exercised by ``bench.py`` / the driver's compile checks instead.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402  (import after env is configured)
import pytest  # noqa: E402

# The experimental 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the CPU backend through the config API before first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU programs; holding them
    all live segfaults the LLVM JIT deep into the run (reproducibly at
    ~test 135, inside ``backend_compile_and_load`` on a trivial slice
    compile).  Modules don't share jitted callables, so per-module cache
    clearing costs nothing and keeps the JIT's code space bounded.
    """
    yield
    jax.clear_caches()
