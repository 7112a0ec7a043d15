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

# Persistent compilation cache: the suite is compile-dominated (shard_map over
# 8 virtual devices, x64) — caching cuts repeat runs from ~25 min to minutes.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
