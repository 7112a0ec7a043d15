"""Infinite-horizon discrete LQR via a jittable DARE solver.

Replaces ``scipy.linalg.solve_discrete_are``
(examples/cartpole/cartpole_mpc.py:287-301) with the structure-preserving
doubling algorithm (SDA) — a fixed-iteration, branch-free method that runs
entirely on device and converges quadratically (each sweep squares the
effective horizon, so ~30 sweeps cover 2^30 steps).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def solve_dare(
    a: jnp.ndarray,
    b: jnp.ndarray,
    q: jnp.ndarray,
    r: jnp.ndarray,
    iterations: int = 30,
) -> jnp.ndarray:
    """Solve ``P = A'PA - A'PB (R + B'PB)^{-1} B'PA + Q`` by doubling.

    Iteration (SDA):
        A_{j+1} = A_j (I + G_j H_j)^{-1} A_j
        G_{j+1} = G_j + A_j G_j (I + H_j G_j)^{-1} A_j'
        H_{j+1} = H_j + A_j' (I + H_j G_j)^{-1} H_j A_j
    with A_0 = A, G_0 = B R^{-1} B', H_0 = Q; H_j -> P.
    """
    n = a.shape[0]
    eye = jnp.eye(n, dtype=a.dtype)
    g0 = b @ jnp.linalg.solve(r, b.T)

    def step(carry, _):
        a_j, g_j, h_j = carry
        lhs = eye + g_j @ h_j  # (I + G H)
        m_a = jnp.linalg.solve(lhs, a_j)  # (I+GH)^{-1} A
        m_g = jnp.linalg.solve(lhs, g_j)  # (I+GH)^{-1} G = G (I+HG)^{-1}
        # (I + H G)^{-1} X = solve(lhs.T, X) since (I+HG) = (I+GH)' for sym G,H
        mh_a = jnp.linalg.solve(lhs.T, h_j @ a_j)
        a_next = a_j @ m_a
        g_next = g_j + a_j @ m_g @ a_j.T  # A G (I+HG)^{-1} A'
        h_next = h_j + a_j.T @ mh_a
        h_next = 0.5 * (h_next + h_next.T)
        g_next = 0.5 * (g_next + g_next.T)
        return (a_next, g_next, h_next), None

    (_, _, p), _ = jax.lax.scan(step, (a, g0, q), None, length=iterations)
    return p


def lqr_gain(
    a: jnp.ndarray,
    b: jnp.ndarray,
    q: jnp.ndarray,
    r: jnp.ndarray,
    iterations: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Infinite-horizon LQR gain ``K = (R + B'PB)^{-1} B'PA`` and P.

    Convention matches the reference (cartpole_mpc.py:297-301):
    ``u = -K (x - x_ref)`` is the stabilizing control.
    """
    p = solve_dare(a, b, q, r, iterations)
    k = jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    return k, p
