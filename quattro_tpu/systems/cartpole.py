"""Cart-pole plant as a pure jnp vector field.

Behavioral contract (reference: examples/cartpole/cartpole_dynamics.py):
state ``x = [pos, vel, theta, theta_dot]`` with ``theta = 0`` upright,
control ``u = [force]``; the underactuated pendulum-on-cart equations with the
``4/3`` effective-length factor (cartpole_dynamics.py:56-69) and the analytic
upright linearization (cartpole_dynamics.py:110-143) kept as a unit-test oracle
for ``jax.jacfwd``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CartPoleParams(NamedTuple):
    """Physical parameters; defaults match the reference (cartpole_dynamics.py:14)."""

    m_cart: float = 1.0
    m_pole: float = 0.1
    length: float = 0.15  # half-length of the pole (pivot to tip)
    gravity: float = 9.81


def cartpole_dynamics(x: jnp.ndarray, u: jnp.ndarray, params: CartPoleParams = CartPoleParams()) -> jnp.ndarray:
    """Continuous-time state derivative dx/dt, shape (4,).

    Pure function of (x, u): safe under jit/vmap/jacfwd. Semantics match
    cartpole_dynamics.py:32-71.
    """
    _, x_dot, theta, theta_dot = x[0], x[1], x[2], x[3]
    force = u[0]

    m_total = params.m_cart + params.m_pole
    sin_th = jnp.sin(theta)
    cos_th = jnp.cos(theta)

    # Force + centrifugal term, normalized by total mass.
    temp = (force + params.m_pole * params.length * theta_dot**2 * sin_th) / m_total

    theta_ddot = (-params.gravity * sin_th + cos_th * temp) / (
        params.length * (4.0 / 3.0 - params.m_pole * cos_th**2 / m_total)
    )
    x_ddot = temp - params.m_pole * params.length * theta_ddot * cos_th / m_total

    return jnp.stack([x_dot, x_ddot, theta_dot, theta_ddot])


def cartpole_linearized(params: CartPoleParams = CartPoleParams()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic continuous-time (A, B) at the upright equilibrium.

    NOTE: the reference's closed form (cartpole_dynamics.py:129-141) is a
    *simplified* textbook linearization (it drops the 4/3 pole-inertia factor
    present in its own nonlinear model), so it does NOT equal
    ``jacfwd(cartpole_dynamics)`` at the origin. We keep the same simplified
    form because the reference's LQR fallback is tuned against it
    (examples/cartpole/cartpole_mpc.py:281-301); tests document the
    discrepancy explicitly.
    """
    m_cart, m_pole, length, g = params.m_cart, params.m_pole, params.length, params.gravity
    a_matrix = jnp.array(
        [
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, -(m_pole * g) / m_cart, 0.0],
            [0.0, 0.0, 0.0, 1.0],
            [0.0, 0.0, (m_cart + m_pole) * g / (m_cart * length), 0.0],
        ]
    )
    b_matrix = jnp.array([[0.0], [1.0 / m_cart], [0.0], [-1.0 / (m_cart * length)]])
    return a_matrix, b_matrix
