"""Receding-horizon MPC controllers over the iLQR solver.

Design: ``MPCController`` builds ONE jitted ``control_step`` whose signature is
``(x_current, mpc_state) -> (u_applied, x_plan, mpc_state')``. The carried
``MPCState`` holds the warm-started control sequence — the reference mutates
``self.ilqr.u`` and shifts it by hand (cartpole_mpc.py:327-331,
quadrotor_mpc.py:114-123); here the shift-and-hold warm start is part of the
jitted step.

Modes (cartpole_mpc.py:124-155 priority logic, resolved statically):
- ``ilqr``        pure iLQR
- ``hybrid``      iLQR + transformer gain prediction
- ``lqr``         infinite-horizon LQR only
- ``blend``       error-norm-weighted mix of hybrid/iLQR and LQR with the
                  reference's 0.05/0.95 cutoffs (cartpole_mpc.py:334-359).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quattro_tpu.solver.costs import make_quadratic_cost, make_quadratic_final_cost
from quattro_tpu.solver.ilqr import (
    ILQRConfig,
    GainPredictFn,
    hybrid_ilqr_solve,
    ilqr_solve,
    ilqr_solve_fused,
)
from quattro_tpu.solver.lqr import lqr_gain
from quattro_tpu.control.switcher import blending_weight


class MPCState(NamedTuple):
    """Carried controller state: the warm-started control sequence."""

    u_warm: jnp.ndarray  # (H, m)


def shift_warm_start(u_seq: jnp.ndarray) -> jnp.ndarray:
    """Receding-horizon shift-and-hold: ``u <- [u[1:], u[-1]]``.

    Semantics: cartpole_mpc.py:331, quadrotor_mpc.py:121-123.
    """
    return jnp.concatenate([u_seq[1:], u_seq[-1:]], axis=0)


@dataclasses.dataclass(frozen=True)
class MPCController:
    """A compiled receding-horizon controller.

    Build via ``make_cartpole_mpc`` / ``make_quadrotor_mpc`` or directly. The
    ``step`` attribute is the jitted control step.
    """

    horizon: int
    control_dim: int
    step: Callable[[jnp.ndarray, MPCState], Tuple[jnp.ndarray, jnp.ndarray, MPCState]]

    def init_state(self, dtype=jnp.float32) -> MPCState:
        return MPCState(u_warm=jnp.zeros((self.horizon, self.control_dim), dtype=dtype))


def build_mpc(
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    running_cost: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    final_cost: Callable[[jnp.ndarray], jnp.ndarray],
    x_ref: jnp.ndarray,
    horizon: int,
    control_dim: int,
    config: ILQRConfig,
    mode: str = "ilqr",
    predict_fn: Optional[GainPredictFn] = None,
    prompt_len: Optional[int] = None,
    state_offset: Optional[jnp.ndarray] = None,
    lqr_matrices: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    blend_epsilon: Tuple[float, float] = (0.5, 1.5),
    exact_fallback: bool = True,
    solver: str = "while",
) -> MPCController:
    """Assemble and jit a control step for the requested mode.

    ``exact_fallback`` (default True, matching the factories): hybrid solves
    are convergence-certified — a would-be-terminating iteration is redone
    with the exact full-horizon backward pass (see ``hybrid_ilqr_solve``).
    Pass False for the reference's raw hybrid semantics, or in ``blend`` mode
    when per-step latency matters more: near the setpoint blend discards the
    hybrid solution for pure LQR, so the certification's extra exact backward
    pass there buys nothing.

    ``solver`` selects the pure-iLQR solve implementation:

    - ``"while"`` (default): ``ilqr_solve`` — ``lax.while_loop`` with dynamic
      early exit; per-step latency varies with how many iterations the warm
      start needs.
    - ``"megakernel"``: ``ilqr_solve_fused`` — the whole solve (linearize,
      Riccati, line search, bookkeeping) as ONE Pallas kernel with FIXED
      ``config.max_iter`` masked trips: deterministic, jitter-free step
      latency for hard real-time loops. Set ``config.max_iter`` to the
      iteration budget (a warm-started receding-horizon step typically
      converges in <= 6). Pure solves only (a ``predict_fn`` needs the
      hybrid path); ``adaptive_reg`` is rejected by the kernel.
    """
    if mode in ("hybrid", "blend") and predict_fn is not None and prompt_len is None:
        raise ValueError("prompt_len is required when a predictor is supplied")
    if solver not in ("while", "megakernel"):
        raise ValueError(f"Unknown solver: {solver!r} (expected 'while' or 'megakernel')")

    use_predictor = predict_fn is not None
    if solver == "megakernel" and use_predictor:
        raise ValueError(
            "solver='megakernel' fuses the pure iLQR solve; hybrid/predictor "
            "controllers need solver='while'"
        )
    if solver == "megakernel" and config.adaptive_reg:
        # ilqr_solve_fused rejects this too, but only when the jitted step
        # is first traced — fail at construction like the other checks here.
        raise ValueError(
            "solver='megakernel' bakes reg into the kernel as a literal; "
            "adaptive_reg needs solver='while'"
        )

    if mode in ("lqr", "blend"):
        if lqr_matrices is None:
            raise ValueError(f"mode={mode!r} needs lqr_matrices=(A_d, B_d, Q_lqr, R_lqr)")
        a_d, b_d, q_lqr, r_lqr = lqr_matrices
        k_lqr, _ = lqr_gain(a_d, b_d, q_lqr, r_lqr)

        def lqr_control(x):
            # Double negation preserved from the reference: control_step returns
            # -compute_linear_lqr_control (cartpole_mpc.py:322), which itself is
            # -K dx (:300), so the applied control is +K dx here, and the sim
            # harness negates once more into the actuator (cartpole_sim.py:153).
            return k_lqr @ (x - x_ref)

    def solve_from(x, u_warm):
        if use_predictor:
            return hybrid_ilqr_solve(
                dynamics, running_cost, final_cost, predict_fn, prompt_len,
                x, u_warm, x_ref, config, state_offset,
                exact_fallback=exact_fallback,
            )
        if solver == "megakernel":
            return ilqr_solve_fused(dynamics, running_cost, final_cost, x, u_warm, config)
        return ilqr_solve(dynamics, running_cost, final_cost, x, u_warm, config)

    if mode == "lqr":

        def step(x, state):
            u = lqr_control(x)
            return u, jnp.zeros((horizon + 1, x.shape[0]), x.dtype), state

    elif mode in ("ilqr", "hybrid"):

        def step(x, state):
            sol = solve_from(x, state.u_warm)
            return sol.u_seq[0], sol.x_seq, MPCState(shift_warm_start(sol.u_seq))

    elif mode == "blend":
        eps_low, eps_high = blend_epsilon

        def step(x, state):
            w = blending_weight(x - x_ref, eps_low, eps_high)
            sol = solve_from(x, state.u_warm)
            u_primary = sol.u_seq[0]
            u_lqr = lqr_control(x)
            # Reference cutoffs (cartpole_mpc.py:340-357). The solve still runs
            # under jit in the w<=0.05 branch (static shapes), but its result is
            # discarded exactly as the reference discards iLQR there.
            u = jnp.where(
                w <= 0.05,
                u_lqr,
                jnp.where(w >= 0.95, u_primary, w * u_primary + (1.0 - w) * u_lqr),
            )
            return u, sol.x_seq, MPCState(shift_warm_start(sol.u_seq))

    else:
        raise ValueError(f"Unknown MPC mode: {mode!r}")

    return MPCController(horizon=horizon, control_dim=control_dim, step=jax.jit(step))


# ---------------------------------------------------------------------------
# System-specific constructors (cost tables from the reference MPCs)
# ---------------------------------------------------------------------------


def make_cartpole_mpc(
    horizon: int = 30,
    dt: float = 0.01,
    integration: str = "rk4",
    mode: str = "ilqr",
    predict_fn: Optional[GainPredictFn] = None,
    prompt_len: Optional[int] = None,
    tol: float = 1e-1,
    exact_fallback: bool = True,
    riccati: str = "auto",
    parallel_riccati: Optional[bool] = None,
    solver: str = "while",
    max_iter: int = 100,
) -> MPCController:
    """Cart-pole MPC with the reference's cost tables (cartpole_mpc.py:187-191).

    LQR fallback uses the simplified analytic linearization discretized as
    ``A_d = I + dt A, B_d = dt B`` (cartpole_mpc.py:271-285).

    ``riccati`` defaults ``"auto"``: the factories build single-trajectory
    latency-mode controllers, where the auto dispatch resolves to the
    associative-scan backward pass (wins at every horizon on TPU —
    docs/DESIGN.md §2 crossover table). If you vmap a factory-built
    controller, pass ``riccati="seq"`` (or build via ``batched_ilqr_solve``,
    which injects the batch hint itself). ``parallel_riccati`` is the legacy
    boolean override.
    """
    from quattro_tpu.systems.cartpole import CartPoleParams, cartpole_dynamics, cartpole_linearized
    from quattro_tpu.systems.integrators import make_discrete

    params = CartPoleParams()
    dyn = make_discrete(lambda x, u: cartpole_dynamics(x, u, params), dt, integration)
    x_ref = jnp.zeros(4)
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), x_ref)
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), x_ref)

    lqr_matrices = None
    if mode in ("lqr", "blend"):
        a_c, b_c = cartpole_linearized(params)
        a_d = jnp.eye(4) + dt * a_c
        b_d = dt * b_c
        lqr_matrices = (a_d, b_d, jnp.diag(jnp.array([1.0, 0.1, 10.0, 0.1])), jnp.diag(jnp.array([0.001])))

    config = ILQRConfig(
        tol=tol, max_iter=max_iter, riccati=riccati, parallel_riccati=parallel_riccati
    )
    return build_mpc(
        dyn, cost, fcost, x_ref, horizon, 1, config, mode=mode,
        predict_fn=predict_fn, prompt_len=prompt_len, lqr_matrices=lqr_matrices,
        exact_fallback=exact_fallback, solver=solver,
    )


def make_quadrotor_mpc(
    horizon: int = 50,
    dt: float = 0.01,
    integration: str = "rk4",
    mode: str = "ilqr",
    predict_fn: Optional[GainPredictFn] = None,
    prompt_len: Optional[int] = None,
    tol: float = 1e-3,
    riccati: str = "auto",
    parallel_riccati: Optional[bool] = None,
    quad_params=None,
    exact_fallback: bool = True,
    solver: str = "while",
    max_iter: int = 100,
) -> MPCController:
    """Quadrotor hover MPC with the reference's cost tables + softplus barrier
    (quadrotor_mpc.py:40-47) and hover state offset z=0.5 (:64-66).

    ``riccati`` defaults ``"auto"`` (resolves to the latency-mode associative
    scan for these single-trajectory controllers; see ``make_cartpole_mpc``).
    """
    from quattro_tpu.systems.quadrotor import QuadrotorParams, quadrotor_dynamics
    from quattro_tpu.systems.integrators import make_discrete

    params = quad_params if quad_params is not None else QuadrotorParams()
    dyn = make_discrete(lambda x, u: quadrotor_dynamics(x, u, params), dt, integration)
    x_ref = jnp.zeros(12).at[2].set(0.5)
    q = jnp.array([10.0, 10.0, 50.0, 1.0, 1.0, 1.0, 10.0, 10.0, 50.0, 1.0, 1.0, 1.0])
    qf = jnp.array([100.0, 100.0, 500.0, 10.0, 10.0, 10.0, 100.0, 100.0, 500.0, 10.0, 10.0, 10.0])
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0, barrier_beta=10.0)
    fcost = make_quadratic_final_cost(qf, x_ref)

    state_offset = jnp.zeros(12).at[2].set(0.5)
    config = ILQRConfig(
        tol=tol, max_iter=max_iter, riccati=riccati, parallel_riccati=parallel_riccati
    )
    return build_mpc(
        dyn, cost, fcost, x_ref, horizon, 4, config, mode=mode,
        predict_fn=predict_fn, prompt_len=prompt_len, state_offset=state_offset,
        exact_fallback=exact_fallback, solver=solver,
    )
