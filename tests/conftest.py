"""Test configuration: force CPU with an 8-device virtual mesh, enable x64.

Distributed tests run against ``--xla_force_host_platform_device_count=8``
(SURVEY.md §4: "Distributed tests without a cluster"); numerical parity tests
against the float64 reference semantics need x64. Must run before any jax
import in the test session.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# It cut repeat suite runs from ~50 to ~30 min, but jax 0.9.0's executable
# (de)serialization segfaulted nondeterministically on this rig — once
# reading (compilation_cache.get_executable_and_time) and once writing
# (put_executable_and_time), at different tests, killing the whole pytest
# process. Within one suite run the in-memory jit cache already dedups
# compiles; only cross-run time is lost, and a green suite beats a fast one.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    Single-process full-suite runs on this rig segfaulted inside XLA's CPU
    backend_compile after ~120 tests' worth of accumulated executables
    (reproducibly around the same late test), while every module passes in
    isolation — process-lifetime compiler state is the correlate. Cross-
    module jit cache hits are rare (each module builds its own closures),
    so the recompile cost is small.
    """
    yield
    jax.clear_caches()
