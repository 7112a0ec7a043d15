"""Explicit integrators lifting continuous dynamics to discrete maps.

Capability parity with the reference's per-class ``discrete_dynamics``
(examples/cartpole/cartpole_dynamics.py:73-108,
examples/quadrotor/quadrotor_dynamics.py:166-198), factored once as
higher-order functions so any plant gets both schemes for free.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

ContinuousDynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
DiscreteDynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def euler_step(f: ContinuousDynamics, x: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Forward Euler: x + dt * f(x, u)."""
    return x + dt * f(x, u)


def rk4_step(f: ContinuousDynamics, x: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Classic Runge-Kutta 4 with zero-order-hold control."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def make_discrete(f: ContinuousDynamics, dt: float, method: str = "rk4") -> DiscreteDynamics:
    """Bind a continuous vector field into a discrete map ``x_next = F(x, u)``.

    ``method`` is resolved at trace time (static), so the returned function is
    branch-free under ``jit``.
    """
    if method == "euler":
        return lambda x, u: euler_step(f, x, u, dt)
    if method == "rk4":
        return lambda x, u: rk4_step(f, x, u, dt)
    raise ValueError(f"Unknown integration method: {method!r} (want 'euler' or 'rk4')")
