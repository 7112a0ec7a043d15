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

# Fast-lane split (VERDICT r3 weak #7): the full suite is compile-dominated
# (~30-50 min solo on this 1-core host); `pytest -m "not slow"` runs the
# core-parity lane in well under 10 min. Tests are marked here, centrally,
# from the measured full-suite duration table (everything whose contended
# call time exceeded ~25 s) — one list to maintain instead of scattered
# decorators. Matching is by (file, test-name prefix) so parametrized cases
# follow their test.
_SLOW_TESTS = {
    "test_parallel.py": (
        "test_horizon_partitioned_riccati_matches_sequential",
        "test_tree_and_ring_halo_schedules_agree",
        "test_podscale_riccati_2d_mesh",
        "test_horizon_partitioned_riccati_cartpole",
        "test_batched_solve_matches_single",
        "test_sharded_traj_solve_matches_batched",
    ),
    "test_ilqr.py": (
        "test_matches_reference_quadrotor_solve",
        "test_hybrid_exact_fallback_recovers_from_bad_predictor",
        "test_full_solve_matches_reference",
        "test_adaptive_regularization_recovers",
        "test_parallel_riccati_full_solve",
        "test_hover_recovery_solve",
        "test_riccati_mode_config",
        "test_logged_solve_matches_plain_and_reference_logs",
        "test_hybrid_exact_fallback_keeps_wide_dtype",
        "test_logged_solve_matches_plain_under_adaptive_reg",
    ),
    "test_distributed.py": (
        "test_two_process_sharded_riccati",
        "test_two_process_collective",
    ),
    "test_mpc_modes.py": (
        "test_hybrid_quadrotor_mujoco_closed_loop",
        "test_hybrid_mujoco_closed_loop",
        "test_blend_mode_cutoff_semantics",
    ),
    "test_training.py": (
        "test_shipped_checkpoints_stabilize_closed_loop",
    ),
    "test_scaling.py": ("test_scaling_quick_smoke",),
    "test_riccati.py": (
        "test_associative_matches_sequential_random_lq",
        "test_auto_dispatch_matches_both_forms",
    ),
    "test_sim.py": (
        "test_quadrotor_bridge_measured_params_and_hover",
    ),
    "test_fused_riccati.py": (
        "test_fused_matches_vmapped_scan_f32",
        "test_fused_matches_vmapped_scan_f64",
        "test_fused_multi_batch_tile",
        "test_fused_batched_solve_matches_vmapped_solve",
        "test_bf16_stream_variant_close_to_f32",
    ),
    "test_fused_rollout.py": (
        "test_fused_linesearch_mode_in_solver",
        "test_fused_batched_rollouts_match_double_vmap",
        "test_line_search_batched_fused_matches_vmapped",
        "test_batched_solver_fused_linesearch_matches_xla",
    ),
    "test_fused_solve.py": (
        "test_fused_solve_lin_block_invariance",
        "test_fused_solve_zero_iteration_case",
        "test_fused_solve_matches_ilqr_solve",
    ),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        names = _SLOW_TESTS.get(item.path.name)
        if names and any(
            item.name == n or item.name.startswith(n + "[") for n in names
        ):
            item.add_marker(pytest.mark.slow)


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
