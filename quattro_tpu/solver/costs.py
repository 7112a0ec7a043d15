"""Cost function builders for trajectory optimization.

Capability parity with the reference MPC cost definitions:
- quadratic running/final costs (examples/cartpole/cartpole_mpc.py:244-269,
  examples/quadrotor/quadrotor_mpc.py:82-100)
- smooth softplus^2 control-positivity barrier
  (examples/quadrotor/quadrotor_mpc.py:74-93).

Costs are plain scalar jnp functions so the solver can quadratize them with
``jax.grad``/``jax.hessian`` — no hand-coded derivatives, no finite
differences.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

RunningCost = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
FinalCost = Callable[[jnp.ndarray], jnp.ndarray]


class QuadraticCost(NamedTuple):
    """Diagonal-weight quadratic tracking cost spec.

    ``x_ref`` enters as data (not a closure constant) in the MPC layer; here it
    is bound at construction for the plain solve API.
    """

    q_diag: jnp.ndarray  # (n,) state weights
    r_diag: jnp.ndarray  # (m,) control weights
    qf_diag: jnp.ndarray  # (n,) terminal state weights


def make_quadratic_cost(
    q: jnp.ndarray,
    r: jnp.ndarray,
    x_ref: jnp.ndarray,
    barrier_alpha: float = 0.0,
    barrier_beta: float = 10.0,
) -> RunningCost:
    """Running cost ``dx'Q dx + u'R u (+ alpha * sum softplus(-u, beta)^2)``.

    Matches the reference convention of NO 1/2 factor
    (cartpole_mpc.py:255-256, quadrotor_mpc.py:86-92). ``q``/``r`` may be full
    matrices or 1-D diagonals.
    """
    q = jnp.asarray(q)
    r = jnp.asarray(r)
    q_mat = jnp.diag(q) if q.ndim == 1 else q
    r_mat = jnp.diag(r) if r.ndim == 1 else r

    def cost(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        dx = x - x_ref
        # sum(a * (M @ a)) rather than a @ M @ a: the final vector.vector
        # contraction becomes a dot_general with only batch dims once the
        # fused megakernel double-vmaps this callable, and Mosaic cannot
        # lower a dot with zero non-contracting dims — the elementwise
        # multiply + reduce form is the same math on the VPU.
        value = jnp.sum(dx * (q_mat @ dx)) + jnp.sum(u * (r_mat @ u))
        if barrier_alpha > 0.0:
            value = value + barrier_alpha * softplus_barrier(u, barrier_beta)
        return value

    return cost


def make_quadratic_final_cost(qf: jnp.ndarray, x_ref: jnp.ndarray) -> FinalCost:
    """Terminal cost ``dx'Qf dx`` (no 1/2 factor; cartpole_mpc.py:258-269)."""
    qf = jnp.asarray(qf)
    qf_mat = jnp.diag(qf) if qf.ndim == 1 else qf

    def cost(x: jnp.ndarray) -> jnp.ndarray:
        dx = x - x_ref
        # Same Mosaic-lowerable form as make_quadratic_cost (see note there).
        return jnp.sum(dx * (qf_mat @ dx))

    return cost


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def _softplus_stable(z: jnp.ndarray, beta: float) -> jnp.ndarray:
    """``log1p(exp(beta z))/beta`` via the overflow-safe max/abs form."""
    return jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(beta * z))) / beta


@_softplus_stable.defjvp
def _softplus_stable_jvp(beta, primals, tangents):
    # Analytic derivative softplus'(z) = sigmoid(beta z), declared explicitly
    # so differentiation never touches the primal's max/abs: their autodiff
    # rules emit boolean selects, whose mask transposes Mosaic cannot legalize
    # when a fused kernel (ops/fused_linquad.py, ops/fused_solve.py) traces
    # cost Hessians in-kernel. sigmoid is the lax.logistic primitive and every
    # higher derivative of it is select-free, so forward-over-reverse Hessians
    # of the barrier lower cleanly on TPU.
    (z,), (z_dot,) = primals, tangents
    return _softplus_stable(z, beta), jax.nn.sigmoid(beta * z) * z_dot


def softplus_barrier(u: jnp.ndarray, beta: float = 10.0) -> jnp.ndarray:
    """Smooth penalty for u < 0: ``sum softplus(-u, beta)^2``.

    ``softplus(z, beta) = log1p(exp(beta z)) / beta`` approximates ``max(0, z)``
    (quadrotor_mpc.py:74-93). Uses the numerically-stable formulation
    ``softplus(z) = max(z, 0) + log1p(exp(-|beta z|))/beta`` so large positive
    arguments don't overflow under float32 (the reference's ``np.log1p(np.exp(.))``
    overflows for beta*z > ~700 in float64 and much earlier in float32), with
    branch-free analytic derivatives (see ``_softplus_stable_jvp``).
    """
    return jnp.sum(_softplus_stable(-u, beta) ** 2)
