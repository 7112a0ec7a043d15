"""Batched autodiff linearization and quadratization over the horizon.

This replaces the reference's #1 hot spot — the central finite-difference
derivative engine (quattro_ilqr_tf/quattro_ilqr_tf.py:149-275), which costs
O(n^2 + nm + m^2) dynamics/cost evaluations *per step, per iteration* — with a
single batched ``vmap(jacfwd)`` sweep: every (A_t, B_t) Jacobian and every
(l_x, l_u, l_xx, l_uu, l_ux) cost expansion across the whole horizon is
computed in one XLA computation, keeping the MXU/VPU fed instead of looping on
the host.

Naming: arrays stacked over time carry a leading horizon axis, e.g.
``a_seq (H, n, n)``, ``b_seq (H, n, m)``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CostExpansion(NamedTuple):
    """Second-order expansion of the running cost along a trajectory.

    Layout follows the reference's Q-expansion inputs
    (quattro_ilqr_tf.py:294-301): ``l_ux`` is d2L/(du dx) with shape (H, m, n).
    """

    l_x: jnp.ndarray  # (H, n)
    l_u: jnp.ndarray  # (H, m)
    l_xx: jnp.ndarray  # (H, n, n)
    l_uu: jnp.ndarray  # (H, m, m)
    l_ux: jnp.ndarray  # (H, m, n)


class FinalCostExpansion(NamedTuple):
    v_x: jnp.ndarray  # (n,)
    v_xx: jnp.ndarray  # (n, n)


def linearize_dynamics(
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_seq: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jacobians (A_t, B_t) of a discrete map for every step of a trajectory.

    Replaces per-column finite differencing (quattro_ilqr_tf.py:182-204) with
    forward-mode autodiff, batched over time.

    Args:
        dynamics: discrete map ``f(x, u) -> x_next``.
        x_seq: (H+1, n) state trajectory (last state unused).
        u_seq: (H, m) control sequence.

    Returns:
        a_seq (H, n, n), b_seq (H, n, m).
    """
    jac = jax.jacfwd(dynamics, argnums=(0, 1))
    a_seq, b_seq = jax.vmap(jac)(x_seq[:-1], u_seq)
    return a_seq, b_seq


def quadratize_cost(
    cost: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_seq: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> CostExpansion:
    """First/second derivatives of the running cost along a trajectory.

    Replaces the 4-point finite-difference stencils
    (quattro_ilqr_tf.py:217-275) with ``grad`` + forward-over-reverse Hessians,
    batched over the horizon in one vmap.
    """
    grad_x = jax.grad(cost, argnums=0)
    grad_u = jax.grad(cost, argnums=1)
    hess_xx = jax.jacfwd(grad_x, argnums=0)
    hess_uu = jax.jacfwd(grad_u, argnums=1)
    hess_ux = jax.jacfwd(grad_u, argnums=0)  # d/dx of dL/du -> (m, n)

    def expand(x: jnp.ndarray, u: jnp.ndarray):
        return (
            grad_x(x, u),
            grad_u(x, u),
            hess_xx(x, u),
            hess_uu(x, u),
            hess_ux(x, u),
        )

    l_x, l_u, l_xx, l_uu, l_ux = jax.vmap(expand)(x_seq[:-1], u_seq)
    return CostExpansion(l_x, l_u, l_xx, l_uu, l_ux)


def quadratize_final_cost(
    final_cost: Callable[[jnp.ndarray], jnp.ndarray],
    x_final: jnp.ndarray,
) -> FinalCostExpansion:
    """Terminal value seed (V_x, V_xx) = (dLf/dx, d2Lf/dx2).

    Replaces the finite-difference gradient/Hessian of the final cost
    (quattro_ilqr_tf.py:149-174).
    """
    v_x = jax.grad(final_cost)(x_final)
    v_xx = jax.hessian(final_cost)(x_final)
    return FinalCostExpansion(v_x, v_xx)
