"""Fused line-search rollout kernel (ops/fused_rollout.py) vs the XLA scan.

Interpret mode (CPU) checks exact agreement in f64; the solver-level test
pins that `ILQRConfig(linesearch="fused")` reproduces the default solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts
from quattro_tpu.solver import (
    ILQRConfig,
    ilqr_solve,
    line_search,
    line_search_fused,
    make_quadratic_cost,
    make_quadratic_final_cost,
)
from quattro_tpu.solver.rollout import feedback_rollout
from quattro_tpu.systems import (
    cartpole_dynamics,
    make_discrete,
    quadrotor_dynamics,
)


def _quad_setup(horizon=17, dtype=jnp.float64, seed=3):
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = 0.1 * jax.random.normal(k1, (12,), dtype)
    x_ref = 0.1 * jax.random.normal(k2, (horizon + 1, 12), dtype)
    u_ref = 2.4525 + 0.1 * jax.random.normal(k3, (horizon, 4), dtype)
    k_seq = 0.05 * jax.random.normal(k4, (horizon, 4), dtype)
    big_k = 0.05 * jax.random.normal(k1, (horizon, 4, 12), dtype)
    return dyn, x0, x_ref, u_ref, k_seq, big_k


@pytest.mark.parametrize("system", ["quadrotor", "cartpole"])
def test_fused_rollouts_match_vmapped_scan(system):
    if system == "quadrotor":
        dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_setup()
    else:
        dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
        key = jax.random.PRNGKey(7)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        horizon = 12
        x0 = 0.1 * jax.random.normal(k1, (4,), jnp.float64)
        x_ref = 0.1 * jax.random.normal(k2, (horizon + 1, 4), jnp.float64)
        u_ref = 0.5 * jax.random.normal(k3, (horizon, 1), jnp.float64)
        k_seq = 0.1 * jax.random.normal(k4, (horizon, 1), jnp.float64)
        big_k = 0.1 * jax.random.normal(k1, (horizon, 1, 4), jnp.float64)

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)
    cand_x, cand_u = fused_feedback_rollouts(
        dyn, x0, x_ref, u_ref, k_seq, big_k, alphas, interpret=True
    )

    def ref_rollout(alpha):
        cost = lambda x, u: jnp.asarray(0.0, x.dtype)
        fcost = lambda x: jnp.asarray(0.0, x.dtype)
        xs, us, _ = feedback_rollout(
            dyn, cost, fcost, x0, x_ref, u_ref, k_seq, big_k, alpha
        )
        return xs, us

    ref_x, ref_u = jax.vmap(ref_rollout)(alphas)
    np.testing.assert_allclose(np.asarray(cand_x), np.asarray(ref_x), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cand_u), np.asarray(ref_u), rtol=1e-12, atol=1e-12)


def test_fused_rollouts_with_array_closure_plant():
    """Plants closing over jnp arrays must lower (constants are hoisted to
    kernel inputs — Pallas rejects captured array constants)."""
    horizon = 9
    drift = jnp.asarray([0.01, -0.02, 0.03, 0.0], jnp.float64)
    gain_mat = 0.1 * jnp.eye(4, 1, dtype=jnp.float64)

    def dyn(x, u):
        return x + 0.01 * (drift + (gain_mat @ u) * jnp.sin(x))

    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = 0.1 * jax.random.normal(k1, (4,), jnp.float64)
    x_ref = 0.1 * jax.random.normal(k2, (horizon + 1, 4), jnp.float64)
    u_ref = 0.5 * jax.random.normal(k3, (horizon, 1), jnp.float64)
    k_seq = 0.1 * jax.random.normal(k4, (horizon, 1), jnp.float64)
    big_k = 0.1 * jax.random.normal(k1, (horizon, 1, 4), jnp.float64)
    alphas = jnp.asarray([1.0, 0.5, 0.1], jnp.float64)

    cand_x, cand_u = fused_feedback_rollouts(
        dyn, x0, x_ref, u_ref, k_seq, big_k, alphas, interpret=True
    )

    def ref_rollout(alpha):
        zero = lambda *a: jnp.asarray(0.0, x0.dtype)
        xs, us, _ = feedback_rollout(
            dyn, zero, zero, x0, x_ref, u_ref, k_seq, big_k, alpha
        )
        return xs, us

    ref_x, ref_u = jax.vmap(ref_rollout)(alphas)
    np.testing.assert_allclose(np.asarray(cand_x), np.asarray(ref_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cand_u), np.asarray(ref_u), atol=1e-12)


def test_line_search_fused_matches_xla():
    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_setup(horizon=14, seed=5)
    x_goal = jnp.zeros(12, x_ref.dtype).at[2].set(0.5)
    cost = make_quadratic_cost(
        jnp.full((12,), 1.0), jnp.full((4,), 0.01), x_goal, barrier_alpha=1000.0
    )
    fcost = make_quadratic_final_cost(jnp.full((12,), 10.0), x_goal)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)
    current = jnp.asarray(1e6, x0.dtype)  # force an accept

    ref = line_search(dyn, cost, fcost, x0, x_ref, u_ref, k_seq, big_k, current, alphas)
    got = line_search_fused(dyn, cost, fcost, x0, x_ref, u_ref, k_seq, big_k, current, alphas)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-11, atol=1e-11)


def test_fused_linesearch_mode_in_solver():
    """Full cart-pole solve with linesearch="fused" matches the default."""
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.15, 0.0, 0.2, 0.0])
    u0 = jnp.zeros((16, 1))
    ref = ilqr_solve(dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-1))
    got = ilqr_solve(
        dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-1, linesearch="fused")
    )
    assert int(got.iterations) == int(ref.iterations)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.u_seq), np.asarray(ref.u_seq), atol=1e-8)


def _quad_batch_setup(batch=5, horizon=13, seed=9, dtype=jnp.float64):
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x0 = 0.1 * jax.random.normal(k1, (batch, 12), dtype)
    x_ref = 0.1 * jax.random.normal(k2, (batch, horizon + 1, 12), dtype)
    u_ref = 2.4525 + 0.1 * jax.random.normal(k3, (batch, horizon, 4), dtype)
    k_seq = 0.05 * jax.random.normal(k4, (batch, horizon, 4), dtype)
    big_k = 0.05 * jax.random.normal(k5, (batch, horizon, 4, 12), dtype)
    return dyn, x0, x_ref, u_ref, k_seq, big_k


def test_fused_batched_rollouts_match_double_vmap():
    """Batched kernel (batch on lanes, alphas on sublanes) vs
    vmap(vmap(feedback_rollout)) — exact in f64 interpret mode, including
    batch-pad (B=5 < 128) and horizon-pad (H=13 % 8 != 0) paths."""
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched

    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_batch_setup()
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)

    cand_x, cand_u = fused_feedback_rollouts_batched(
        dyn, x0, x_ref, u_ref, k_seq, big_k, alphas, interpret=True
    )

    zero = lambda *a: jnp.asarray(0.0, x0.dtype)

    def one(alpha, x0_, xr, ur, kk, kb):
        xs, us, _ = feedback_rollout(dyn, zero, zero, x0_, xr, ur, kk, kb, alpha)
        return xs, us

    ref_x, ref_u = jax.vmap(
        lambda alpha: jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0))(
            alpha, x0, x_ref, u_ref, k_seq, big_k
        )
    )(alphas)
    np.testing.assert_allclose(np.asarray(cand_x), np.asarray(ref_x), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cand_u), np.asarray(ref_u), rtol=1e-12, atol=1e-12)


def test_line_search_batched_fused_matches_vmapped():
    from quattro_tpu.solver.rollout import line_search_batched_fused

    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_batch_setup(batch=4, horizon=11, seed=2)
    x_goal = jnp.zeros(12, x_ref.dtype).at[2].set(0.5)
    cost = make_quadratic_cost(
        jnp.full((12,), 1.0), jnp.full((4,), 0.01), x_goal, barrier_alpha=1000.0
    )
    fcost = make_quadratic_final_cost(jnp.full((12,), 10.0), x_goal)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)
    # Mixed accepts: lane 0 forced accept, others realistic.
    current = jnp.asarray([1e9, 50.0, 120.0, 80.0], x0.dtype)

    ref = jax.vmap(
        lambda x0_, xr, ur, kk, kb, c: line_search(
            dyn, cost, fcost, x0_, xr, ur, kk, kb, c, alphas
        )
    )(x0, x_ref, u_ref, k_seq, big_k, current)
    got = line_search_batched_fused(
        dyn, cost, fcost, x0, x_ref, u_ref, k_seq, big_k, current, alphas,
        interpret=True,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-11, atol=1e-11)


def test_batched_solver_fused_linesearch_matches_xla():
    """_batched_ilqr_solve_fused with linesearch="fused" reproduces the
    linesearch="xla" batched solve (interpret mode, f64 exact)."""
    from quattro_tpu.parallel.batch import _batched_ilqr_solve_fused

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    key = jax.random.PRNGKey(4)
    x0 = 0.2 * jax.random.normal(key, (3, 4), jnp.float64)
    u0 = jnp.zeros((3, 10, 1), jnp.float64)
    ref = _batched_ilqr_solve_fused(
        dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-1, max_iter=4), interpret=True
    )
    got = _batched_ilqr_solve_fused(
        dyn, cost, fcost, x0, u0,
        ILQRConfig(tol=1e-1, max_iter=4, linesearch="fused"), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.u_seq), np.asarray(ref.u_seq), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(got.iterations), np.asarray(ref.iterations))


def test_unknown_linesearch_mode_raises():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    with pytest.raises(ValueError, match="linesearch"):
        ilqr_solve(
            dyn, cost, fcost, jnp.zeros(4), jnp.zeros((4, 1)),
            ILQRConfig(linesearch="nope"),
        )


def test_fused2d_batched_rollouts_match_double_vmap():
    """batch2d kernel ((alpha, batch) pairs on sublanes+lanes) vs
    vmap(vmap(feedback_rollout)) — exact in f64 interpret mode, including
    pair-pad, horizon-pad, and the multi-resident-tile path."""
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched2d

    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_batch_setup()
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)

    cand_x, cand_u = fused_feedback_rollouts_batched2d(
        dyn, x0, x_ref, u_ref, k_seq, big_k, alphas, interpret=True,
        tile_s=1, block_t=4, max_resident=2,
    )

    zero = lambda *a: jnp.asarray(0.0, x0.dtype)

    def one(alpha, x0_, xr, ur, kk, kb):
        xs, us, _ = feedback_rollout(dyn, zero, zero, x0_, xr, ur, kk, kb, alpha)
        return xs, us

    ref_x, ref_u = jax.vmap(
        lambda alpha: jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0))(
            alpha, x0, x_ref, u_ref, k_seq, big_k
        )
    )(alphas)
    np.testing.assert_allclose(np.asarray(cand_x), np.asarray(ref_x), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cand_u), np.asarray(ref_u), rtol=1e-12, atol=1e-12)


def test_line_search_batched2d_matches_vmapped_line_search():
    """r5 wrapper: batch2d rollout kernel + XLA cost/select reproduces
    vmap(line_search) exactly in f64 interpret mode (found flag, chosen
    alpha, trajectories, cost)."""
    from quattro_tpu.solver.rollout import line_search_batched2d, simulate

    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_batch_setup(batch=3, horizon=9)
    q = jnp.asarray(
        [10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1], x0.dtype
    )
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01, x0.dtype), jnp.zeros(12, x0.dtype))
    fcost = make_quadratic_final_cost(10 * q, jnp.zeros(12, x0.dtype))
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], x0.dtype)

    def traj_cost(xs, us):
        return jnp.sum(jax.vmap(cost)(xs[:-1], us)) + fcost(xs[-1])

    xs = jax.vmap(lambda x, u: simulate(dyn, x, u))(x0, u_ref)
    c0 = jax.vmap(traj_cost)(xs, u_ref)

    ref = jax.vmap(
        lambda x0_, x_, u_, kk_, kb_, c_: line_search(
            dyn, cost, fcost, x0_, x_, u_, kk_, kb_, c_, alphas
        )
    )(x0, xs, u_ref, k_seq, big_k, c0)
    got = line_search_batched2d(
        dyn, cost, fcost, x0, xs, u_ref, k_seq, big_k, c0, alphas,
        interpret=True,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, dtype=np.float64), np.asarray(g, dtype=np.float64),
            rtol=1e-12, atol=1e-12,
        )


def test_fuse_cost_rollout_matches_two_pass():
    """feedback_rollout(fuse_cost=True) returns the same trajectory exactly
    and the same total cost up to f64 summation-order noise."""
    dyn, x0, x_ref, u_ref, k_seq, big_k = _quad_batch_setup(batch=1, horizon=11)
    q = jnp.asarray(
        [10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1], x0.dtype
    )
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01, x0.dtype), jnp.zeros(12, x0.dtype))
    fcost = make_quadratic_final_cost(10 * q, jnp.zeros(12, x0.dtype))

    args = (dyn, cost, fcost, x0[0], x_ref[0], u_ref[0], k_seq[0], big_k[0],
            jnp.asarray(0.5, x0.dtype))
    x_a, u_a, c_a = feedback_rollout(*args)
    x_b, u_b, c_b = feedback_rollout(*args, fuse_cost=True)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b), rtol=0, atol=0)
    np.testing.assert_allclose(float(c_a), float(c_b), rtol=1e-12)
