"""Whole-solve fused kernel (ops/fused_solve.py) vs ilqr_solve.

Interpret mode on CPU: the fused solve must reproduce the while-loop solver
exactly (f64) — cost trajectory, accepted iterations, controls, gains, and
the convergence flags, on both flagship systems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.solver import (
    ILQRConfig,
    ilqr_solve,
    ilqr_solve_fused,
    make_quadratic_cost,
    make_quadratic_final_cost,
)
from quattro_tpu.systems import (
    cartpole_dynamics,
    make_discrete,
    quadrotor_dynamics,
)


def _cartpole_problem():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.15, 0.0, 0.2, 0.0])
    u0 = jnp.zeros((16, 1))
    return dyn, cost, fcost, x0, u0


def _quadrotor_problem(horizon=20):
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(12).at[2].set(0.5)
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]),
        x_ref,
    )
    x0 = jnp.zeros(12).at[2].set(0.2).at[6].set(0.1)
    u0 = jnp.zeros((horizon, 4))
    return dyn, cost, fcost, x0, u0


# riccati="seq" on the reference side: the fused kernel implements the
# sequential update law; the default "auto" resolves to the associative
# form at batch 1, whose regularization placement differs below solver
# tolerance (docs/DESIGN.md §2) — a real ~1e-4 gain difference that is not
# a kernel bug.
@pytest.mark.parametrize("problem,config", [
    ("cartpole", ILQRConfig(tol=1e-1, riccati="seq")),
    ("cartpole", ILQRConfig(tol=0.0, max_iter=4, riccati="seq")),  # forced-iteration bench mode
    ("quadrotor", ILQRConfig(tol=1e-3, max_iter=12, riccati="seq")),
])
def test_fused_solve_matches_ilqr_solve(problem, config):
    dyn, cost, fcost, x0, u0 = (
        _cartpole_problem() if problem == "cartpole" else _quadrotor_problem()
    )
    ref = ilqr_solve(dyn, cost, fcost, x0, u0, config)
    got = ilqr_solve_fused(dyn, cost, fcost, x0, u0, config)

    assert int(got.iterations) == int(ref.iterations)
    assert bool(got.converged) == bool(ref.converged)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.u_seq), np.asarray(ref.u_seq), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x_seq), np.asarray(ref.x_seq), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.k_seq), np.asarray(ref.k_seq), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got.big_k_seq), np.asarray(ref.big_k_seq), atol=1e-7
    )


def test_fused_solve_zero_iteration_case():
    """max_iter=0: returns the initial rollout, zero gains, not converged."""
    dyn, cost, fcost, x0, u0 = _cartpole_problem()
    cfg = ILQRConfig(max_iter=0)
    ref = ilqr_solve(dyn, cost, fcost, x0, u0, cfg)
    got = ilqr_solve_fused(dyn, cost, fcost, x0, u0, cfg)
    assert int(got.iterations) == int(ref.iterations) == 0
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.k_seq), 0.0)


def test_fused_solve_rejects_adaptive_reg():
    dyn, cost, fcost, x0, u0 = _cartpole_problem()
    with pytest.raises(ValueError, match="adaptive"):
        ilqr_solve_fused(dyn, cost, fcost, x0, u0, ILQRConfig(adaptive_reg=True))


def test_fused_solve_lin_block_invariance():
    """The blocked linearize phase (lin_block trips of the jacfwd/hessian
    trace — the VMEM fix for production horizons, see fused_solve.py) is
    bit-equivalent to the single-shot whole-horizon trace: per-point
    derivatives do not depend on the blocking."""
    from quattro_tpu.ops.fused_solve import fused_ilqr_solve_kernel
    from quattro_tpu.solver.rollout import simulate, trajectory_cost

    dyn, cost, fcost, x0, u0 = _quadrotor_problem(horizon=20)
    x_init = simulate(dyn, x0, u0)
    cost_init = trajectory_cost(cost, fcost, x_init, u0)
    run = lambda blk: fused_ilqr_solve_kernel(
        dyn, cost, fcost, x_init, u0, cost_init,
        max_iter=4, tol=1e-3, reg=1e-6, alphas=(1.0, 0.5, 0.25, 0.1, 0.05, 0.01),
        interpret=True, lin_block=blk,
    )
    single = run(20)  # whole-horizon single-shot trace
    for blk in (4, 10):
        blocked = run(blk)
        for a, b in zip(blocked, single):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_solve_lin_block_must_divide_horizon():
    from quattro_tpu.ops.fused_solve import fused_ilqr_solve_kernel
    from quattro_tpu.solver.rollout import simulate, trajectory_cost

    dyn, cost, fcost, x0, u0 = _cartpole_problem()
    x_init = simulate(dyn, x0, u0)
    cost_init = trajectory_cost(cost, fcost, x_init, u0)
    with pytest.raises(ValueError, match="lin_block"):
        fused_ilqr_solve_kernel(
            dyn, cost, fcost, x_init, u0, cost_init,
            max_iter=1, tol=1e-3, reg=1e-6, alphas=(1.0,),
            interpret=True, lin_block=7,
        )
