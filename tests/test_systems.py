"""Plant-model unit tests: dynamics values, integrators, linearization oracles."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.systems import (
    CartPoleParams,
    QuadrotorParams,
    cartpole_dynamics,
    cartpole_linearized,
    euler_step,
    hover_control,
    make_discrete,
    quadrotor_dynamics,
    rk4_step,
)

sys.path.insert(0, "/root/reference/examples/cartpole")
sys.path.insert(0, "/root/reference/examples/quadrotor")


@pytest.fixture(scope="module")
def ref_cartpole():
    from cartpole_dynamics import CartPoleDynamics

    return CartPoleDynamics()


@pytest.fixture(scope="module")
def ref_quadrotor():
    from quadrotor_dynamics import QuadrotorDynamics

    return QuadrotorDynamics()


class TestCartPole:
    def test_matches_reference_vector_field(self, ref_cartpole):
        rng = np.random.default_rng(0)
        for _ in range(20):
            x = rng.normal(size=4)
            u = rng.normal(size=1)
            ours = np.asarray(cartpole_dynamics(jnp.array(x), jnp.array(u)))
            theirs = ref_cartpole.continuous_dynamics(x, u)
            np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)

    def test_rk4_matches_reference(self, ref_cartpole):
        rng = np.random.default_rng(1)
        x = rng.normal(size=4)
        u = rng.normal(size=1)
        ours = np.asarray(rk4_step(cartpole_dynamics, jnp.array(x), jnp.array(u), 0.01))
        theirs = ref_cartpole.discrete_dynamics(x, u, 0.01, method="rk4")
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)

    def test_euler_matches_reference(self, ref_cartpole):
        x = np.array([0.1, -0.2, 0.3, 0.4])
        u = np.array([0.5])
        ours = np.asarray(euler_step(cartpole_dynamics, jnp.array(x), jnp.array(u), 0.01))
        theirs = ref_cartpole.discrete_dynamics(x, u, 0.01, method="euler")
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)

    def test_analytic_linearization_matches_reference(self, ref_cartpole):
        a_ours, b_ours = cartpole_linearized()
        a_ref, b_ref = ref_cartpole.linearized_dynamics()
        np.testing.assert_allclose(np.asarray(a_ours), a_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(b_ours), b_ref, rtol=1e-12)

    def test_jacfwd_upright_b_column(self):
        """jacfwd at upright: B-column structure of the TRUE nonlinear model.

        Documents the reference discrepancy (see ``cartpole_linearized``
        docstring): the true model has d(theta_ddot)/du = +1/(tm*l*(4/3 -
        m/tm)) > 0 at upright, while the reference's simplified analytic B
        claims -1/(M*l) < 0 (cartpole_dynamics.py:136-141). The iLQR solver
        linearizes the true model, so we pin the true signs here.
        """
        jac_u = jax.jacfwd(cartpole_dynamics, argnums=1)(jnp.zeros(4), jnp.zeros(1))
        assert jac_u[0, 0] == 0.0 and jac_u[2, 0] == 0.0
        assert jac_u[1, 0] > 0.0  # push right -> cart accelerates right
        assert jac_u[3, 0] > 0.0  # true-model sign (reference's analytic B disagrees)


class TestQuadrotor:
    def test_matches_reference_vector_field(self, ref_quadrotor):
        rng = np.random.default_rng(2)
        for _ in range(20):
            x = rng.normal(size=12) * 0.5
            u = rng.uniform(0.0, 5.0, size=4)
            ours = np.asarray(quadrotor_dynamics(jnp.array(x), jnp.array(u)))
            theirs = ref_quadrotor.continuous_dynamics(x, u)
            np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)

    def test_hover_is_equilibrium(self):
        x_eq = jnp.zeros(12)
        dx = quadrotor_dynamics(x_eq, hover_control())
        np.testing.assert_allclose(np.asarray(dx), np.zeros(12), atol=1e-12)

    def test_jacfwd_matches_reference_fd_linearization(self, ref_quadrotor):
        """Our autodiff (A, B) vs the reference's eps=1e-6 central differences
        at hover (quadrotor_dynamics.py:200-259): agreement to FD truncation."""
        a_ref, b_ref = ref_quadrotor.linearized_dynamics()
        jac = jax.jacfwd(quadrotor_dynamics, argnums=(0, 1))
        a_ours, b_ours = jac(jnp.zeros(12), hover_control())
        np.testing.assert_allclose(np.asarray(a_ours), a_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b_ours), b_ref, atol=1e-6)

    def test_rk4_matches_reference(self, ref_quadrotor):
        rng = np.random.default_rng(3)
        x = rng.normal(size=12) * 0.3
        u = rng.uniform(0.0, 5.0, size=4)
        ours = np.asarray(rk4_step(quadrotor_dynamics, jnp.array(x), jnp.array(u), 0.01))
        theirs = ref_quadrotor.discrete_dynamics(x, u, 0.01, method="rk4")
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


def test_make_discrete_rejects_unknown_method():
    with pytest.raises(ValueError):
        make_discrete(cartpole_dynamics, 0.01, "verlet")
