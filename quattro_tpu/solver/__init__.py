"""iLQR solver core: autodiff linearization, Riccati factorization, rollouts.

TPU-native replacement for the reference solver
(quattro_ilqr_tf/quattro_ilqr_tf.py): finite differences become ``jax.jacfwd``
batched over the horizon, the sequential backward Riccati recursion becomes a
``lax.scan`` (and an associative-scan parallel variant), the sequential 6-way
line search becomes one batched rollout, and the outer iteration loop is a
``lax.while_loop`` — the whole solve is a single XLA computation.
"""

from quattro_tpu.solver.costs import (
    QuadraticCost,
    make_quadratic_cost,
    make_quadratic_final_cost,
    softplus_barrier,
)
from quattro_tpu.solver.derivatives import linearize_dynamics, quadratize_cost, quadratize_final_cost
from quattro_tpu.solver.riccati import (
    riccati_backward,
    riccati_backward_segment,
    riccati_backward_associative,
    riccati_backward_auto,
    riccati_backward_fused,
)
from quattro_tpu.solver.rollout import (
    simulate,
    trajectory_cost,
    feedback_rollout,
    line_search,
    line_search_fused,
)
from quattro_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRSolution,
    ilqr_solve_fused,
    ilqr_solve,
    ilqr_solve_with_logs,
    hybrid_ilqr_solve,
)
from quattro_tpu.solver.lqr import solve_dare, lqr_gain

__all__ = [
    "QuadraticCost",
    "make_quadratic_cost",
    "make_quadratic_final_cost",
    "softplus_barrier",
    "linearize_dynamics",
    "quadratize_cost",
    "quadratize_final_cost",
    "riccati_backward",
    "riccati_backward_segment",
    "riccati_backward_associative",
    "riccati_backward_auto",
    "riccati_backward_fused",
    "simulate",
    "trajectory_cost",
    "feedback_rollout",
    "line_search",
    "line_search_fused",
    "ILQRConfig",
    "ILQRSolution",
    "ilqr_solve",
    "ilqr_solve_fused",
    "ilqr_solve_with_logs",
    "hybrid_ilqr_solve",
    "solve_dare",
    "lqr_gain",
]
