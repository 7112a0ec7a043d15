"""End-to-end iLQR golden tests against the reference solver.

The reference solver is deterministic pure NumPy (no RNG anywhere in its
solve path), so full-solve trajectories are exact oracles up to the
FD-vs-autodiff derivative difference (SURVEY.md §4 "Golden-trajectory
integration tests").
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.solver import (
    ILQRConfig,
    ilqr_solve,
    ilqr_solve_with_logs,
    make_quadratic_cost,
    make_quadratic_final_cost,
    simulate,
    trajectory_cost,
)
from quattro_tpu.systems import cartpole_dynamics, make_discrete, quadrotor_dynamics

sys.path.insert(0, "/root/reference")


def _cartpole_setup():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    return dyn, cost, fcost


def _reference_cartpole(x0, horizon, tol):
    from quattro_ilqr_tf.quattro_ilqr_tf import iLQR_TF

    q = np.diag([5.0, 0.1, 10.0, 0.1])
    r = np.diag([0.001])
    qf = np.diag([50.0, 6.0, 100.0, 0.1])
    dyn, _, _ = _cartpole_setup()

    def np_dyn(x, u):
        return np.asarray(dyn(jnp.array(x), jnp.array(u)))

    def np_cost(x, u):
        return float(x @ q @ x + u @ r @ u)

    def np_fcost(x):
        return float(x @ qf @ x)

    solver = iLQR_TF(
        np_dyn, np_cost, np_fcost, x0, [np.zeros(1)] * horizon, horizon,
        tol=tol, enable_log=True,
    )
    u_seq, x_seq = solver.optimize(x_ref=np.zeros(4))
    return solver, np.asarray(u_seq), np.asarray(x_seq)


class TestCartPoleGolden:
    def test_full_solve_matches_reference(self):
        """Same (x0, u_init, H, tol): cost and final state match the reference
        solve within FD-truncation-justified tolerance (config 1 in
        BASELINE.json)."""
        x0 = np.array([0.2, 0.0, 0.3, 0.0])
        ref, u_ref, x_ref_seq = _reference_cartpole(x0, horizon=30, tol=1e-1)
        ref_cost = ref.compute_total_cost(x_ref_seq, list(u_ref))

        dyn, cost, fcost = _cartpole_setup()
        sol = ilqr_solve(dyn, cost, fcost, jnp.array(x0), jnp.zeros((30, 1)), ILQRConfig(tol=1e-1))

        assert abs(float(sol.cost) - ref_cost) / ref_cost < 1e-6
        np.testing.assert_allclose(np.asarray(sol.x_seq[-1]), x_ref_seq[-1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.u_seq), u_ref, atol=1e-3)
        # Iteration counts agree (reference total_iter is the 0-based index of
        # the last executed iteration).
        assert int(sol.iterations) == ref.total_iter + 1

    def test_parallel_riccati_full_solve(self):
        x0 = np.array([0.2, 0.0, 0.3, 0.0])
        dyn, cost, fcost = _cartpole_setup()
        seq = ilqr_solve(dyn, cost, fcost, jnp.array(x0), jnp.zeros((30, 1)), ILQRConfig(tol=1e-1))
        par = ilqr_solve(
            dyn, cost, fcost, jnp.array(x0), jnp.zeros((30, 1)),
            ILQRConfig(tol=1e-1, parallel_riccati=True),
        )
        assert abs(float(par.cost) - float(seq.cost)) / float(seq.cost) < 1e-6

    def test_riccati_mode_config(self):
        """`riccati="seq"|"assoc"|"auto"` all reach the same solution; a bad
        mode string raises; "auto" honors the batch hint."""
        x0 = np.array([0.2, 0.0, 0.3, 0.0])
        dyn, cost, fcost = _cartpole_setup()
        u0 = jnp.zeros((30, 1))
        base = ilqr_solve(dyn, cost, fcost, jnp.array(x0), u0, ILQRConfig(tol=1e-1, riccati="seq"))
        for mode, hint in (("assoc", 1), ("auto", 1), ("auto", 64)):
            sol = ilqr_solve(
                dyn, cost, fcost, jnp.array(x0), u0,
                ILQRConfig(tol=1e-1, riccati=mode, batch_hint=hint),
            )
            assert abs(float(sol.cost) - float(base.cost)) / float(base.cost) < 1e-6
        with pytest.raises(ValueError):
            ilqr_solve(dyn, cost, fcost, jnp.array(x0), u0, ILQRConfig(riccati="warp"))
        # _replace builds via tuple.__new__, bypassing the patched __new__ —
        # the validation hook must cover it too.
        with pytest.raises(ValueError):
            ILQRConfig()._replace(riccati="warp")
        with pytest.raises(ValueError):
            ILQRConfig()._replace(linesearch="warp")

    def test_backward_dispatch_resolution(self):
        """The config resolves to the right backward-pass callable — incl. the
        batch hint reaching `riccati_backward_auto` (VERDICT r1 weak #8)."""
        from quattro_tpu.solver import ilqr as ilqr_mod

        fn = ilqr_mod._backward(ILQRConfig(riccati="auto", batch_hint=64))
        assert fn.func is ilqr_mod.riccati_backward_auto
        assert fn.keywords["batch_size"] == 64
        assert ilqr_mod._backward(ILQRConfig(riccati="seq")) is ilqr_mod.riccati_backward
        assert (
            ilqr_mod._backward(ILQRConfig(riccati="assoc"))
            is ilqr_mod.riccati_backward_associative
        )
        # Legacy boolean override beats the mode string.
        assert (
            ilqr_mod._backward(ILQRConfig(riccati="auto", parallel_riccati=False))
            is ilqr_mod.riccati_backward
        )

    def test_batched_solve_injects_batch_hint(self):
        """`batched_ilqr_solve` must fill the dispatch hint with the real
        batch width so a vmapped auto-mode solve picks the sequential form."""
        import quattro_tpu.parallel.batch as batch_mod

        seen = {}
        orig = batch_mod.ilqr_solve

        def spy(dynamics, cost, final_cost, x0, u_init, config):
            seen["config"] = config
            return orig(dynamics, cost, final_cost, x0, u_init, config)

        dyn, cost, fcost = _cartpole_setup()
        x0s = jnp.tile(jnp.array([0.1, 0.0, 0.1, 0.0]), (4, 1))
        u0s = jnp.zeros((4, 30, 1))
        batch_mod.ilqr_solve = spy
        try:
            batch_mod.batched_ilqr_solve(
                dyn, cost, fcost, x0s, u0s, ILQRConfig(tol=1e-1, max_iter=2)
            )
        finally:
            batch_mod.ilqr_solve = orig
        assert seen["config"].batch_hint == 4

    def test_logged_solve_matches_plain_and_reference_logs(self):
        x0 = np.array([0.15, 0.0, -0.25, 0.0])
        ref, _, _ = _reference_cartpole(x0, horizon=30, tol=1e-1)

        dyn, cost, fcost = _cartpole_setup()
        plain = ilqr_solve(dyn, cost, fcost, jnp.array(x0), jnp.zeros((30, 1)), ILQRConfig(tol=1e-1))
        sol, logs = ilqr_solve_with_logs(
            dyn, cost, fcost, jnp.array(x0), jnp.zeros((30, 1)), ILQRConfig(tol=1e-1)
        )
        assert float(sol.cost) == pytest.approx(float(plain.cost), rel=1e-12)
        assert int(sol.iterations) == int(plain.iterations)
        valid = np.asarray(logs.valid)
        assert valid.sum() == int(sol.iterations)
        # Per-iteration costs match the reference's logged current_cost.
        ref_costs = [entry["current_cost"] for entry in ref.logs]
        our_costs = np.asarray(logs.cost)[valid]
        np.testing.assert_allclose(our_costs, ref_costs, rtol=1e-5)
        # Accepted step sizes match.
        ref_alphas = [entry["alpha"] or 0.0 for entry in ref.logs]
        np.testing.assert_allclose(np.asarray(logs.alpha)[valid], ref_alphas)

    def test_logged_solve_matches_plain_under_adaptive_reg(self):
        """The logs variant threads the SAME traced LM mu-schedule as
        ilqr_solve — a failed line search grows mu and retries instead of
        terminating (previously it silently ran with static reg)."""
        dyn, cost, fcost = _cartpole_setup()
        x0 = jnp.array([0.3, 0.0, 0.5, 0.0])
        u0 = jnp.zeros((30, 1))
        # An absurdly LARGE initial reg forces early line-search behavior to
        # differ from the static-reg path, exercising the retry schedule.
        cfg = ILQRConfig(tol=1e-1, adaptive_reg=True, reg=1e-2, reg_factor=10.0)
        plain = ilqr_solve(dyn, cost, fcost, x0, u0, cfg)
        sol, logs = ilqr_solve_with_logs(dyn, cost, fcost, x0, u0, cfg)
        assert int(sol.iterations) == int(plain.iterations)
        assert bool(sol.converged) == bool(plain.converged)
        assert float(sol.cost) == pytest.approx(float(plain.cost), rel=1e-12)
        np.testing.assert_allclose(
            np.asarray(sol.u_seq), np.asarray(plain.u_seq), atol=1e-12
        )


class TestQuadrotorGolden:
    def test_hover_recovery_solve(self):
        """Quadrotor with softplus barrier converges and respects u >= 0
        (config 2 in BASELINE.json; barrier semantics quadrotor_mpc.py:74-93)."""
        x_ref = jnp.zeros(12).at[2].set(0.5)
        dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
        q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
        qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
        cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0)
        fcost = make_quadratic_final_cost(qf, x_ref)

        x0 = jnp.zeros(12).at[2].set(0.2).at[6].set(0.1)
        sol = ilqr_solve(dyn, cost, fcost, x0, jnp.zeros((50, 4)), ILQRConfig(tol=1e-3))
        assert bool(sol.converged)
        # Barrier keeps thrusts essentially nonnegative.
        assert float(jnp.min(sol.u_seq)) > -1e-2
        # Altitude moves toward the 0.5 m reference.
        assert abs(float(sol.x_seq[-1, 2]) - 0.5) < 0.05

    def test_matches_reference_quadrotor_solve(self):
        from quattro_ilqr_tf.quattro_ilqr_tf import iLQR_TF

        x_ref = np.zeros(12)
        x_ref[2] = 0.5
        q = np.diag([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
        r = np.diag([0.01] * 4)
        qf = np.diag([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])

        dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")

        def np_dyn(x, u):
            return np.asarray(dyn(jnp.array(x), jnp.array(u)))

        def softplus(z, beta=10.0):
            return np.log1p(np.exp(beta * z)) / beta

        def np_cost(x, u):
            dx = x - x_ref
            return float(dx @ q @ dx + u @ r @ u + 1000.0 * np.sum(softplus(-u) ** 2))

        def np_fcost(x):
            dx = x - x_ref
            return float(dx @ qf @ dx)

        horizon = 20
        x0 = np.zeros(12)
        x0[2] = 0.3
        ref = iLQR_TF(
            np_dyn, np_cost, np_fcost, x0, [np.zeros(4)] * horizon, horizon,
            tol=1e-3, enable_log=False,
        )
        u_ref, x_ref_seq = ref.optimize(x_ref=x_ref)
        ref_cost = ref.compute_total_cost(x_ref_seq, list(u_ref))

        cost = make_quadratic_cost(jnp.array(np.diag(q)), jnp.array(np.diag(r)), jnp.array(x_ref), barrier_alpha=1000.0)
        fcost = make_quadratic_final_cost(jnp.array(np.diag(qf)), jnp.array(x_ref))
        sol = ilqr_solve(dyn, cost, fcost, jnp.array(x0), jnp.zeros((horizon, 4)), ILQRConfig(tol=1e-3))
        assert abs(float(sol.cost) - ref_cost) / ref_cost < 1e-4
        np.testing.assert_allclose(np.asarray(sol.x_seq[-1]), x_ref_seq[-1], atol=1e-4)


def test_simulate_and_cost_consistency():
    dyn, cost, fcost = _cartpole_setup()
    x0 = jnp.array([0.1, 0.0, 0.1, 0.0])
    u = 0.1 * jnp.ones((10, 1))
    x_seq = simulate(dyn, x0, u)
    assert x_seq.shape == (11, 4)
    total = trajectory_cost(cost, fcost, x_seq, u)
    manual = sum(float(cost(x_seq[t], u[t])) for t in range(10)) + float(fcost(x_seq[-1]))
    assert float(total) == pytest.approx(manual, rel=1e-12)


def test_adaptive_regularization_recovers():
    """LM mu-schedule keeps optimizing where fixed-reg stops on the first
    rejected step (SURVEY.md §5.3 robustness upgrade; opt-in)."""
    dyn, cost, fcost = _cartpole_setup()
    x0 = jnp.array([0.4, 0.0, 0.6, 0.0])  # aggressive start
    fixed = ilqr_solve(dyn, cost, fcost, x0, jnp.zeros((30, 1)), ILQRConfig(tol=1e-6, max_iter=60))
    adaptive = ilqr_solve(
        dyn, cost, fcost, x0, jnp.zeros((30, 1)),
        ILQRConfig(tol=1e-6, max_iter=60, adaptive_reg=True),
    )
    # Adaptive must never be worse, and both must be finite.
    assert np.isfinite(float(adaptive.cost)) and np.isfinite(float(fixed.cost))
    assert float(adaptive.cost) <= float(fixed.cost) * (1 + 1e-9)


def test_gain_token_pack_unpack_roundtrip_multi_input():
    """pack/unpack must be exact inverses for m > 1 — the round-2 layout bug:
    pack was [k (m) | K.flat] while unpack read the interleaved (m, 1+n)
    layout, scrambling every predicted quadrotor gain (identical layouts for
    m=1, which is why the cart-pole never caught it)."""
    from quattro_tpu.solver.ilqr import pack_gain_tokens, unpack_gain_tokens

    m, n, steps = 4, 12, 7
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(steps, m)))
    big_k = jnp.asarray(rng.normal(size=(steps, m, n)))
    tokens = pack_gain_tokens(k, big_k)
    assert tokens.shape == (steps, m * (1 + n))
    k2, big_k2 = unpack_gain_tokens(tokens, m, n)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k))
    np.testing.assert_array_equal(np.asarray(big_k2), np.asarray(big_k))
    # Reference training layout (transformer_ilqr.py:77-84): interleaved
    # per-channel [k_i, K[i, :]] chunks.
    ref_tokens = np.concatenate(
        [np.asarray(k)[:, :, None], np.asarray(big_k)], axis=-1
    ).reshape(steps, -1)
    np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)


def test_collection_rows_share_solver_token_layout():
    """Training rows (training/collect.py::_pack_rows) and the solver's
    prompt/unpack (pack_gain_tokens) must agree — a divergence trains the
    model on one layout and queries it in another."""
    from quattro_tpu.solver.ilqr import pack_gain_tokens
    from quattro_tpu.training.collect import _pack_rows

    rows, horizon, m, n = 3, 5, 4, 12
    k = np.random.default_rng(0).normal(size=(rows, horizon, m)).astype(np.float32)
    big_k = np.random.default_rng(1).normal(size=(rows, horizon, m, n)).astype(np.float32)
    packed = _pack_rows(k, big_k)
    for r in range(rows):
        np.testing.assert_array_equal(
            packed[r], np.asarray(pack_gain_tokens(jnp.asarray(k[r]), jnp.asarray(big_k[r])))
        )


def test_hybrid_exact_fallback_recovers_from_bad_predictor():
    """With a useless predictor the plain hybrid solve stalls far from the
    optimum; exact_fallback certifies convergence with exact iterations and
    must land at the pure-iLQR solution (solver/ilqr.py::hybrid_ilqr_solve)."""
    from quattro_tpu.solver import (
        ILQRConfig,
        hybrid_ilqr_solve,
        ilqr_solve,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(4)
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), x_ref)
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), x_ref)
    x0 = jnp.array([0.3, 0.0, 0.4, 0.0])
    u0 = jnp.zeros((30, 1))
    config = ILQRConfig(tol=1e-6, max_iter=60)

    def garbage_predict(x_err, prompt):
        # Self-consistent nonsense: zero head gains every iteration.
        return jnp.zeros((25, 5), dtype=x_err.dtype)

    exact = ilqr_solve(dyn, cost, fcost, x0, u0, config)
    stalled = hybrid_ilqr_solve(
        dyn, cost, fcost, garbage_predict, 5, x0, u0, x_ref, config
    )
    rescued = hybrid_ilqr_solve(
        dyn, cost, fcost, garbage_predict, 5, x0, u0, x_ref, config,
        exact_fallback=True,
    )
    assert float(stalled.cost) > 1.2 * float(exact.cost)
    np.testing.assert_allclose(float(rescued.cost), float(exact.cost), rtol=1e-3)


def test_hybrid_exact_fallback_keeps_wide_dtype():
    """Mixed precision: with f64 problem data and an f32 predictor, the
    certified solve must carry trajectories/cost at the WIDER dtype — the
    certification's |dJ| test loses meaning if the exact iteration's cost is
    truncated to f32 (solver/ilqr.py carry-dtype promotion)."""
    from quattro_tpu.solver import (
        ILQRConfig,
        hybrid_ilqr_solve,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(4, dtype=jnp.float64)
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1], dtype=jnp.float64),
        jnp.array([0.001], dtype=jnp.float64),
        x_ref,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([50.0, 6.0, 100.0, 0.1], dtype=jnp.float64), x_ref
    )
    x0 = jnp.array([0.3, 0.0, 0.4, 0.0], dtype=jnp.float64)
    u0 = jnp.zeros((30, 1), dtype=jnp.float64)

    def f32_predict(x_err, prompt):
        return jnp.zeros((25, 5), dtype=jnp.float32)

    sol = hybrid_ilqr_solve(
        dyn, cost, fcost, f32_predict, 5, x0, u0, x_ref,
        ILQRConfig(tol=1e-6, max_iter=20), exact_fallback=True,
    )
    assert sol.cost.dtype == jnp.float64
    assert sol.x_seq.dtype == jnp.float64
    assert sol.u_seq.dtype == jnp.float64
    assert bool(sol.converged)


def test_linesearch_unroll_identical_solve():
    """linesearch_unroll changes scan scheduling only — solutions match the
    default bit-for-bit (same ops, same order, fewer loop trips)."""
    from quattro_tpu.solver import ILQRConfig, ilqr_solve
    from quattro_tpu.systems import cartpole_dynamics, make_discrete
    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.2, 0.0, 0.3, 0.0])
    u0 = jnp.zeros((20, 1))
    base = ilqr_solve(dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-6, max_iter=10))
    unrolled = ilqr_solve(
        dyn, cost, fcost, x0, u0,
        ILQRConfig(tol=1e-6, max_iter=10, linesearch_unroll=8),
    )
    np.testing.assert_array_equal(np.asarray(base.u_seq), np.asarray(unrolled.u_seq))
    assert int(base.iterations) == int(unrolled.iterations)


def test_linesearch_fuse_cost_solves_and_validates():
    """linesearch_fuse_cost folds cost accumulation into the rollout scan:
    same solution on a well-separated problem; combining it with the fused
    rollout kernel (which has no in-scan cost) must fail loudly."""
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.1, 0.0, 0.15, 0.0])
    u0 = jnp.zeros((20, 1))
    ref = ilqr_solve(dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-8, max_iter=12))
    got = ilqr_solve(
        dyn, cost, fcost, x0, u0,
        ILQRConfig(tol=1e-8, max_iter=12, linesearch_fuse_cost=True),
    )
    np.testing.assert_allclose(
        np.asarray(got.u_seq), np.asarray(ref.u_seq), rtol=1e-6, atol=1e-9
    )
    with pytest.raises(ValueError, match="linesearch_fuse_cost"):
        ILQRConfig(linesearch="fused", linesearch_fuse_cost=True)
