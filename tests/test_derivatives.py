"""Autodiff derivative engine vs the reference's finite differences.

Oracle strategy per SURVEY.md §4: evaluate the reference FD routines
(quattro_ilqr_tf.py:149-275) and our vmapped autodiff at identical points;
agreement must be within FD truncation error (eps=1e-5 central differences).
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.solver import (
    linearize_dynamics,
    quadratize_cost,
    quadratize_final_cost,
    make_quadratic_cost,
    make_quadratic_final_cost,
)
from quattro_tpu.systems import cartpole_dynamics, make_discrete

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_solver():
    from quattro_ilqr_tf.quattro_ilqr_tf import iLQR_TF

    q = np.diag([5.0, 0.1, 10.0, 0.1])
    r = np.diag([0.001])
    qf = np.diag([50.0, 6.0, 100.0, 0.1])

    dt = 0.01

    def np_cont(x, u):
        from quattro_tpu.systems.cartpole import CartPoleParams

        p = CartPoleParams()
        _, x_dot, th, thd = x
        f = u[0]
        s, c = np.sin(th), np.cos(th)
        tm = p.m_cart + p.m_pole
        temp = (f + p.m_pole * p.length * thd**2 * s) / tm
        thdd = (-p.gravity * s + c * temp) / (p.length * (4.0 / 3.0 - p.m_pole * c**2 / tm))
        xdd = temp - p.m_pole * p.length * thdd * c / tm
        return np.array([x_dot, xdd, thd, thdd])

    def np_dyn(x, u):
        k1 = np_cont(x, u)
        k2 = np_cont(x + 0.5 * dt * k1, u)
        k3 = np_cont(x + 0.5 * dt * k2, u)
        k4 = np_cont(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def np_cost(x, u):
        return float(x @ q @ x + u @ r @ u)

    def np_fcost(x):
        return float(x @ qf @ x)

    u_init = [np.zeros(1) for _ in range(20)]
    solver = iLQR_TF(np_dyn, np_cost, np_fcost, np.zeros(4), u_init, 20, enable_log=False)
    return solver


@pytest.fixture(scope="module")
def our_fns():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    return dyn, cost, fcost


def test_dynamics_jacobians_match_fd(ref_solver, our_fns):
    dyn, _, _ = our_fns
    rng = np.random.default_rng(4)
    x_seq = rng.normal(size=(4, 4)) * 0.4
    u_seq = rng.normal(size=(3, 1))
    a_seq, b_seq = linearize_dynamics(dyn, jnp.array(x_seq), jnp.array(u_seq))
    for t in range(3):
        a_fd, b_fd = ref_solver._compute_dynamics_jacobians(x_seq[t], u_seq[t])
        np.testing.assert_allclose(np.asarray(a_seq[t]), a_fd, atol=5e-8)
        np.testing.assert_allclose(np.asarray(b_seq[t]), b_fd, atol=5e-8)


def test_cost_expansion_matches_fd(ref_solver, our_fns):
    _, cost, _ = our_fns
    rng = np.random.default_rng(5)
    x_seq = rng.normal(size=(3, 4)) * 0.4
    u_seq = rng.normal(size=(2, 1))
    exp = quadratize_cost(cost, jnp.array(x_seq), jnp.array(u_seq))
    for t in range(2):
        _, l_x, l_u, l_xx, l_uu, l_xu = ref_solver._compute_cost_derivatives(x_seq[t], u_seq[t])
        np.testing.assert_allclose(np.asarray(exp.l_x[t]), l_x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(exp.l_u[t]), l_u, atol=1e-5)
        np.testing.assert_allclose(np.asarray(exp.l_xx[t]), l_xx, atol=1e-4)
        np.testing.assert_allclose(np.asarray(exp.l_uu[t]), l_uu, atol=1e-4)
        # reference returns L_xu (n, m); ours is l_ux (m, n)
        np.testing.assert_allclose(np.asarray(exp.l_ux[t]), l_xu.T, atol=1e-4)


def test_final_cost_expansion_matches_fd(ref_solver, our_fns):
    _, _, fcost = our_fns
    x = np.array([0.3, -0.1, 0.2, 0.05])
    exp = quadratize_final_cost(fcost, jnp.array(x))
    grad_fd = ref_solver._finite_diff_gradient_final(x)
    hess_fd = ref_solver._finite_diff_hessian_final(x)
    np.testing.assert_allclose(np.asarray(exp.v_x), grad_fd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(exp.v_xx), hess_fd, atol=1e-3)


def test_quadratic_cost_exact_derivatives(our_fns):
    """For pure quadratics the autodiff expansion is exact: l_xx = 2Q."""
    _, cost, _ = our_fns
    x_seq = jnp.zeros((2, 4))
    u_seq = jnp.zeros((1, 1))
    exp = quadratize_cost(cost, x_seq, u_seq)
    np.testing.assert_allclose(
        np.asarray(exp.l_xx[0]), 2.0 * np.diag([5.0, 0.1, 10.0, 0.1]), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(exp.l_uu[0]), [[0.002]], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(exp.l_ux[0]), np.zeros((1, 4)), atol=1e-15)
