"""iLQR drivers: pure, logging, and hybrid (transformer-accelerated) solves.

TPU-native re-design of ``iLQR_TF.optimize``
(quattro_ilqr_tf/quattro_ilqr_tf.py:423-591):

- the outer iteration loop is a ``lax.while_loop`` (early exit on convergence,
  shape-static) instead of a Python loop;
- the entire solve — rollout, autodiff linearization, Riccati scan, batched
  line search, and (in hybrid mode) the transformer forward — is ONE jitted
  XLA computation. The reference crosses a host<->accelerator boundary on every
  ``tf.predict`` call (transformer_ilqr.py:315-323); here the model's matmuls
  execute on the MXU inside the same program as the solver.

Convergence contract (quattro_ilqr_tf.py:440-472): accept the first step size
with cost <= current; stop when no step is accepted OR |J_prev - J_new| < tol.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quattro_tpu.solver.derivatives import (
    linearize_dynamics,
    quadratize_cost,
    quadratize_final_cost,
)
from functools import partial

from quattro_tpu.solver.riccati import (
    riccati_backward,
    riccati_backward_associative,
    riccati_backward_auto,
    riccati_backward_fused,
)
from quattro_tpu.solver.rollout import (
    DEFAULT_ALPHAS,
    line_search,
    line_search_fused,
    simulate,
    trajectory_cost,
)

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
RunningCost = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
FinalCost = Callable[[jnp.ndarray], jnp.ndarray]
# predict(x_err_seq (H+1, n), prompt (W, m*(1+n))) -> (H - W, m*(1+n))
GainPredictFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class ILQRConfig(NamedTuple):
    """Solver configuration (static under jit).

    Defaults mirror the reference constructor (quattro_ilqr_tf.py:74-76).

    ``riccati`` selects the backward-pass form:

    - ``"auto"`` (default): dispatch on the workload shape via
      ``riccati_backward_auto`` — the associative scan for single-trajectory
      latency (its O(log H) depth wins at every measured horizon), the
      vmapped sequential scan for batched throughput (``batch_hint`` >= 8,
      where the batch axis already fills the MXU and each associative
      combine costs ~12x a plain Riccati step — docs/DESIGN.md §2).
    - ``"seq"`` / ``"assoc"``: force one form.
    - ``"fused"``: the single-trajectory fused Pallas kernel — fastest
      measured at every single-trajectory shape (1.3-1.6x over "assoc") but
      ~5 min of Mosaic compile per new shape; opt-in for latency-critical
      deployments with a warm persistent compile cache.

    ``batch_hint`` is the trajectory-batch width the solve will be vmapped
    over (static under jit; the solver cannot see an enclosing vmap).
    ``batched_ilqr_solve`` fills it in automatically.

    ``parallel_riccati`` is the legacy boolean override (True = assoc,
    False = seq); ``None`` defers to ``riccati``.

    ``adaptive_reg`` enables a Levenberg-Marquardt mu-schedule on the Q_uu
    regularizer — a robustness upgrade over the reference's fixed 1e-6 +
    stop-on-first-failure (SURVEY.md §5.3): when no step size is accepted the
    solver retries with mu * reg_factor instead of terminating, and shrinks
    mu after accepted steps; it gives up only at reg_max. Default OFF
    (reference semantics).
    """

    max_iter: int = 100
    tol: float = 1e-3
    reg: float = 1e-6
    alphas: Tuple[float, ...] = DEFAULT_ALPHAS
    parallel_riccati: Optional[bool] = None
    adaptive_reg: bool = False
    reg_factor: float = 10.0
    reg_max: float = 1e2
    chol_solve: bool = True  # unrolled small-matrix Cholesky for Q_uu solves
    riccati: str = "auto"  # "auto" | "seq" | "assoc" | "fused"
    batch_hint: int = 1
    # "xla": all-alpha vmapped scan; "fused": one Pallas kernel with the
    # dynamics traced in (ops/fused_rollout.py) — the single-trajectory
    # latency fast path, same Mosaic-compile-cost caveat as riccati="fused".
    # Under batched_ilqr_solve's fused backend, "fused" selects the BATCHED
    # rollout kernel (batch on lanes, alphas on sublanes) instead.
    linesearch: str = "xla"
    # lax.scan unroll factor for the "xla" line-search rollouts: identical
    # numerics, fewer while-loop trips. Batched solves are per-trip-overhead
    # bound in this phase (tiny (B*A, n) rows per step); 8 is the measured
    # sweet spot at the canonical batched shapes (benchmarks/
    # batched_phases.py sweep). Keep 1 for single-trajectory latency paths
    # (the fused rollout kernel owns that regime).
    linesearch_unroll: int = 1
    # Accumulate the running cost INSIDE the "xla" line-search rollout scan
    # instead of a second pass over the materialized trajectories — halves
    # the phase's HBM re-reads. Same cost value up to f32 summation order
    # (sequential accumulation vs stacked-axis sum), so a near-tie accept can
    # flip on individual lanes; off by default (reference summation
    # semantics). benchmarks/batched_phases.py measures both forms.
    linesearch_fuse_cost: bool = False


# Fail fast on typo'd mode strings at construction rather than deep inside a
# traced solve (the NamedTuple-generated __new__ accepts anything). Both
# construction paths are covered: __new__ AND _replace (NamedTuple._replace
# builds via tuple.__new__ directly, bypassing the patched __new__ — and
# _replace is the standard mutation idiom throughout this codebase).
_RICCATI_MODES = ("auto", "seq", "assoc", "fused")
_LINESEARCH_MODES = ("xla", "fused")
_config_new = ILQRConfig.__new__
_config_replace = ILQRConfig._replace


def _validate_config(self):
    if self.riccati not in _RICCATI_MODES:
        raise ValueError(
            f"Unknown riccati mode: {self.riccati!r} (auto|seq|assoc|fused)"
        )
    if self.linesearch not in _LINESEARCH_MODES:
        raise ValueError(
            f"Unknown linesearch mode: {self.linesearch!r} (xla|fused)"
        )
    if self.linesearch == "fused" and self.linesearch_unroll != 1:
        # The unroll factor only threads into the "xla" scan rollouts; the
        # fused rollout kernel has no scan to unroll, and silently ignoring
        # the knob would misreport what actually ran.
        raise ValueError(
            "linesearch_unroll only affects linesearch='xla' (it unrolls the "
            "XLA rollout scan); combining it with linesearch='fused' has no "
            f"effect (got linesearch_unroll={self.linesearch_unroll})"
        )
    if self.linesearch == "fused" and self.linesearch_fuse_cost:
        # The fused rollout kernels evaluate costs OUTSIDE the kernel (XLA);
        # there is no in-scan accumulation to switch on.
        raise ValueError(
            "linesearch_fuse_cost only affects linesearch='xla' (it folds the "
            "running cost into the XLA rollout scan); combining it with "
            "linesearch='fused' has no effect"
        )
    return self


def _validated_config_new(cls, *args, **kwargs):
    return _validate_config(_config_new(cls, *args, **kwargs))


def _validated_config_replace(self, **kwargs):
    return _validate_config(_config_replace(self, **kwargs))


ILQRConfig.__new__ = _validated_config_new
ILQRConfig._replace = _validated_config_replace


class ILQRSolution(NamedTuple):
    x_seq: jnp.ndarray  # (H+1, n)
    u_seq: jnp.ndarray  # (H, m)
    cost: jnp.ndarray  # scalar
    iterations: jnp.ndarray  # scalar int, number of iterations executed
    converged: jnp.ndarray  # scalar bool
    k_seq: jnp.ndarray  # (H, m) gains from the last backward pass
    big_k_seq: jnp.ndarray  # (H, m, n)


class ILQRLogs(NamedTuple):
    """Per-iteration solver telemetry, stacked over max_iter.

    The structured-array replacement for the reference's list-of-dicts logs
    (quattro_ilqr_tf.py:453-466) — these drive both observability and
    training-data generation. ``valid[i]`` marks iterations actually executed.
    """

    x_seq: jnp.ndarray  # (max_iter, H+1, n) trajectory at iteration start
    u_seq: jnp.ndarray  # (max_iter, H, m) controls after the iteration's update
    cost: jnp.ndarray  # (max_iter,) cost at iteration start
    new_cost: jnp.ndarray  # (max_iter,) cost after the update
    k_seq: jnp.ndarray  # (max_iter, H, m)
    big_k_seq: jnp.ndarray  # (max_iter, H, m, n)
    alpha: jnp.ndarray  # (max_iter,) accepted step size (0 if none)
    found_update: jnp.ndarray  # (max_iter,) bool
    valid: jnp.ndarray  # (max_iter,) bool


def _backward(config: ILQRConfig):
    if config.parallel_riccati is not None:  # legacy boolean override
        return riccati_backward_associative if config.parallel_riccati else riccati_backward
    if config.riccati == "seq":
        return riccati_backward
    if config.riccati == "assoc":
        return riccati_backward_associative
    if config.riccati == "fused":
        if config.adaptive_reg:
            raise ValueError(
                "riccati='fused' bakes reg into the kernel as a literal; "
                "the adaptive LM mu-schedule needs riccati='seq'|'assoc'|'auto'"
            )
        # The solve loop carries reg as a traced scalar (for the LM mode);
        # the kernel needs the static value — substitute config.reg.
        return lambda a, b, e, vx, vxx, reg, use_chol: riccati_backward_fused(
            a, b, e, vx, vxx, config.reg, use_chol
        )
    if config.riccati == "auto":
        return partial(riccati_backward_auto, batch_size=config.batch_hint)
    raise ValueError(
        f"Unknown riccati mode: {config.riccati!r} (auto|seq|assoc|fused)"
    )


def _line_search(config: ILQRConfig):
    if config.linesearch == "xla":
        if config.linesearch_unroll != 1 or config.linesearch_fuse_cost:
            return partial(
                line_search,
                unroll=config.linesearch_unroll,
                fuse_cost=config.linesearch_fuse_cost,
            )
        return line_search
    if config.linesearch == "fused":
        return line_search_fused
    raise ValueError(f"Unknown linesearch mode: {config.linesearch!r} (xla|fused)")


def _ilqr_iteration(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    config: ILQRConfig,
    x0: jnp.ndarray,
    x_seq: jnp.ndarray,
    u_seq: jnp.ndarray,
    current_cost: jnp.ndarray,
    reg=None,
):
    """One full iLQR iteration: linearize -> Riccati -> line search.

    ``reg`` may be a traced scalar (adaptive LM mode); defaults to the static
    config value.
    """
    if reg is None:
        reg = config.reg
    a_seq, b_seq = linearize_dynamics(dynamics, x_seq, u_seq)
    cost_exp = quadratize_cost(cost, x_seq, u_seq)
    final_exp = quadratize_final_cost(final_cost, x_seq[-1])

    res = _backward(config)(
        a_seq, b_seq, cost_exp, final_exp.v_x, final_exp.v_xx, reg, config.chol_solve
    )

    alphas = jnp.asarray(config.alphas, dtype=x_seq.dtype)
    found, alpha, new_x, new_u, new_cost = _line_search(config)(
        dynamics, cost, final_cost, x0, x_seq, u_seq, res.k_seq, res.big_k_seq,
        current_cost, alphas,
    )
    return found, alpha, new_x, new_u, new_cost, res.k_seq, res.big_k_seq


def ilqr_solve(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,
    config: ILQRConfig = ILQRConfig(),
) -> ILQRSolution:
    """Pure iLQR with early exit (``lax.while_loop``).

    Semantics: the ``tf is None`` branch of ``optimize``
    (quattro_ilqr_tf.py:425-479).
    """
    x_init = simulate(dynamics, x0, u_init)
    cost_init = trajectory_cost(cost, final_cost, x_init, u_init)
    horizon, m = u_init.shape
    n = x0.shape[0]

    def cond(state):
        iteration, done = state[5], state[6]
        return jnp.logical_and(iteration < config.max_iter, jnp.logical_not(done))

    def body(state):
        x_seq, u_seq, current_cost, _, _, iteration, _, reg = state
        found, _, new_x, new_u, new_cost, k_seq, big_k_seq = _ilqr_iteration(
            dynamics, cost, final_cost, config, x0, x_seq, u_seq, current_cost, reg=reg
        )
        small_improvement = jnp.abs(current_cost - new_cost) < config.tol
        if config.adaptive_reg:
            # LM mu-schedule: shrink on success, grow and RETRY on failure;
            # terminate only when converged or mu saturates.
            reg_next = jnp.where(
                found,
                jnp.maximum(reg / config.reg_factor, config.reg),
                jnp.minimum(reg * config.reg_factor, config.reg_max),
            )
            done = jnp.logical_or(
                jnp.logical_and(found, small_improvement),
                jnp.logical_and(jnp.logical_not(found), reg >= config.reg_max),
            )
        else:
            reg_next = reg
            done = jnp.logical_or(jnp.logical_not(found), small_improvement)
        return (new_x, new_u, new_cost, k_seq, big_k_seq, iteration + 1, done, reg_next)

    zeros_k = jnp.zeros((horizon, m), dtype=u_init.dtype)
    zeros_big_k = jnp.zeros((horizon, m, n), dtype=u_init.dtype)
    init = (
        x_init, u_init, cost_init, zeros_k, zeros_big_k,
        jnp.asarray(0), jnp.asarray(False), jnp.asarray(config.reg, dtype=x_init.dtype),
    )
    x_seq, u_seq, final_cost_val, k_seq, big_k_seq, iterations, done, _ = jax.lax.while_loop(
        cond, body, init
    )
    return ILQRSolution(x_seq, u_seq, final_cost_val, iterations, done, k_seq, big_k_seq)


def ilqr_solve_fused(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,
    config: ILQRConfig = ILQRConfig(),
) -> ILQRSolution:
    """``ilqr_solve`` with EVERY iteration phase fused into one Pallas kernel.

    The entire solve loop — autodiff linearization/quadratization, backward
    Riccati, all-alpha line search, convergence bookkeeping — runs inside a
    single VMEM-resident kernel (ops/fused_solve.py), eliminating every
    XLA fusion boundary and per-step loop dispatch. Identical convergence
    semantics to ``ilqr_solve`` (fixed-trip masked iterations, the
    ``ilqr_solve_with_logs`` equivalence construction).

    Constraints: the dynamics/cost callables must lower through Mosaic
    (standard jnp math does); static ``reg`` (no ``adaptive_reg``);
    ``config.riccati``/``linesearch`` are ignored (everything is fused).
    Off-TPU the kernel runs in interpret mode (slow — for tests).
    """
    from quattro_tpu.ops.fused_solve import fused_ilqr_solve_kernel

    if config.adaptive_reg:
        raise ValueError(
            "ilqr_solve_fused bakes reg into the kernel as a literal; "
            "the adaptive LM mu-schedule needs ilqr_solve"
        )
    x_init = simulate(dynamics, x0, u_init)
    cost_init = trajectory_cost(cost, final_cost, x_init, u_init)
    interpret = jax.default_backend() != "tpu"
    x_seq, u_seq, k_seq, big_k_seq, stats = fused_ilqr_solve_kernel(
        dynamics, cost, final_cost, x_init, u_init, cost_init,
        config.max_iter, config.tol, config.reg, tuple(config.alphas),
        interpret=interpret,
    )
    return ILQRSolution(
        x_seq, u_seq, stats[0, 0],
        stats[0, 1].astype(jnp.int32), stats[0, 2] > 0.5,
        k_seq, big_k_seq,
    )


def ilqr_solve_with_logs(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,
    config: ILQRConfig = ILQRConfig(),
) -> Tuple[ILQRSolution, ILQRLogs]:
    """Pure iLQR via early-exit ``lax.while_loop``, emitting per-iteration logs.

    Used by the training-data pipeline (the reference generates training rows
    from iteration logs — SURVEY.md §7.7). Log buffers are carried at a fixed
    ``max_iter`` capacity and written at the iteration index; entries past
    ``iterations`` keep their zero-init and ``valid=False``. Early exit
    matters for collection throughput: fixed-trip scanning paid for all
    ``max_iter`` iterations even though a warm-started receding-horizon step
    converges in a handful (the reference collects with max_iter=100), and
    under ``vmap`` the while form costs only the max over lanes.
    """
    x_init = simulate(dynamics, x0, u_init)
    cost_init = trajectory_cost(cost, final_cost, x_init, u_init)
    horizon, m = u_init.shape
    n = x0.shape[0]
    dtype = x_init.dtype
    mi = config.max_iter

    logs_init = ILQRLogs(
        x_seq=jnp.zeros((mi, horizon + 1, n), dtype),
        u_seq=jnp.zeros((mi, horizon, m), dtype),
        cost=jnp.zeros((mi,), dtype),
        new_cost=jnp.zeros((mi,), dtype),
        k_seq=jnp.zeros((mi, horizon, m), dtype),
        big_k_seq=jnp.zeros((mi, horizon, m, n), dtype),
        alpha=jnp.zeros((mi,), dtype),
        found_update=jnp.zeros((mi,), bool),
        valid=jnp.zeros((mi,), bool),
    )

    def cond(state):
        _, _, _, iteration, done, _, _ = state
        return jnp.logical_and(iteration < mi, jnp.logical_not(done))

    def body(state):
        x_seq, u_seq, current_cost, iteration, done, reg, logs = state
        found, alpha, new_x, new_u, new_cost, k_seq, big_k_seq = _ilqr_iteration(
            dynamics, cost, final_cost, config, x0, x_seq, u_seq, current_cost,
            reg=reg,
        )
        small_improvement = jnp.abs(current_cost - new_cost) < config.tol
        if config.adaptive_reg:
            # Same LM mu-schedule as ilqr_solve's while body: a failed line
            # search grows mu and RETRIES (the trajectory is unchanged on
            # failure), terminating only when converged or mu saturates.
            reg_next = jnp.where(
                found,
                jnp.maximum(reg / config.reg_factor, config.reg),
                jnp.minimum(reg * config.reg_factor, config.reg_max),
            )
            now_done = jnp.logical_or(
                jnp.logical_and(found, small_improvement),
                jnp.logical_and(jnp.logical_not(found), reg >= config.reg_max),
            )
        else:
            reg_next = reg
            now_done = jnp.logical_or(jnp.logical_not(found), small_improvement)
        entry = ILQRLogs(
            x_seq=x_seq, u_seq=new_u, cost=current_cost, new_cost=new_cost,
            k_seq=k_seq, big_k_seq=big_k_seq, alpha=alpha, found_update=found,
            valid=jnp.asarray(True),
        )
        logs_out = jax.tree_util.tree_map(
            lambda buf, val: jax.lax.dynamic_update_index_in_dim(
                buf, val.astype(buf.dtype), iteration, 0
            ),
            logs, entry,
        )
        return (
            new_x, new_u, new_cost, iteration + 1,
            jnp.logical_or(done, now_done), reg_next, logs_out,
        )

    init = (
        x_init, u_init, cost_init, jnp.asarray(0), jnp.asarray(False),
        jnp.asarray(config.reg, dtype=dtype), logs_init,
    )
    x_seq, u_seq, cost_val, iterations, done, _, log_tuple = jax.lax.while_loop(
        cond, body, init
    )
    # Final gains: last valid backward pass.
    last = jnp.maximum(iterations - 1, 0)
    solution = ILQRSolution(
        x_seq, u_seq, cost_val, iterations, done,
        log_tuple.k_seq[last], log_tuple.big_k_seq[last],
    )
    return solution, log_tuple


def pack_gain_tokens(k_seq: jnp.ndarray, big_k_seq: jnp.ndarray) -> jnp.ndarray:
    """Gain token layout: INTERLEAVED per control channel —
    ``[k_0, K[0, :], k_1, K[1, :], ...]`` (token dim m*(1+n); cart-pole
    1*5=5, quadrotor 4*13=52).

    This is the layout the reference TRAINS on
    (transformer_ilqr.py:77-84: ``concat([k[..., None], K], -1).reshape``)
    and unpacks predictions with (quattro_ilqr_tf.py:509-514: reshape
    ``(T, m, 1+n)``, ``k = [:, :, 0]``). NOTE a real reference
    inconsistency: its inference-time PROMPT is packed as
    ``[k (m) | K.flat]`` instead (quattro_ilqr_tf.py:496-502) — for m > 1
    that feeds the model prompts in a layout it never saw in training
    (mild: the quadrotor prompt is 1 token and its shipped model tolerates
    it). We do NOT replicate that quirk (SURVEY §7.8 policy): prompt,
    training rows, and unpack all use this one training-consistent layout,
    which for m = 1 is byte-identical to the reference's prompt too.
    """
    return jnp.concatenate([k_seq[:, :, None], big_k_seq], axis=-1).reshape(
        k_seq.shape[0], -1
    )


def unpack_gain_tokens(tokens: jnp.ndarray, m: int, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of ``pack_gain_tokens``: (T, m(1+n)) -> k (T, m), K (T, m, n).

    Matches the unpack at quattro_ilqr_tf.py:509-514.
    """
    steps = tokens.shape[0]
    kk = tokens.reshape(steps, m, 1 + n)
    return kk[:, :, 0], kk[:, :, 1:]


def hybrid_ilqr_solve(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    predict_fn: GainPredictFn,
    window: int,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,
    x_ref: jnp.ndarray,
    config: ILQRConfig = ILQRConfig(),
    state_offset: Optional[jnp.ndarray] = None,
    exact_fallback: bool = False,
) -> ILQRSolution:
    """Transformer-accelerated iLQR.

    Per iteration (semantics: quattro_ilqr_tf.py:481-591): run the exact
    Riccati backward pass only over the LAST ``window`` steps, pack those tail
    gains as the prompt, let the learned model predict the FIRST
    ``H - window`` gains in one parallel forward, concatenate
    ``[predicted head, exact tail]``, then the standard batched line search.

    ``predict_fn`` must be a jittable function (e.g. a flax apply with bound
    params + normalizer); it receives the state-error trajectory
    ``x_seq - x_ref + state_offset`` (H+1 rows, quattro_ilqr_tf.py:504) and the
    packed prompt, and returns DE-normalized gain tokens.

    ``exact_fallback`` (an extension over the reference — OFF by default to
    preserve its semantics): whenever a hybrid iteration would TERMINATE the
    solve (every candidate rejected, or |ΔJ| < tol), the iteration is redone
    with the exact full-horizon backward pass, and only an exact iteration
    that also fails to improve ends the solve. "Accelerate when the model
    helps, never converge to its mistakes": out-of-distribution predictions
    otherwise either stall the solve or — worse — let it settle smoothly far
    from the optimum (self-consistent wrong gains pass the |ΔJ| test).
    Inherits pure-iLQR convergence at the cost of >= 1 exact iteration per
    solve.
    """
    if state_offset is None:
        state_offset = jnp.zeros_like(x0)

    x_init = simulate(dynamics, x0, u_init)
    cost_init = trajectory_cost(cost, final_cost, x_init, u_init)
    horizon, m = u_init.shape
    n = x0.shape[0]

    def hybrid_iteration(x_seq, u_seq, current_cost):
        # Exact tail: linearize/quadratize only the last `window` steps.
        tail_x = x_seq[horizon - window :]
        tail_u = u_seq[horizon - window :]
        a_tail, b_tail = linearize_dynamics(dynamics, tail_x, tail_u)
        tail_exp = quadratize_cost(cost, tail_x, tail_u)
        final_exp = quadratize_final_cost(final_cost, x_seq[-1])
        res = riccati_backward(
            a_tail, b_tail, tail_exp, final_exp.v_x, final_exp.v_xx, config.reg,
            config.chol_solve,
        )

        prompt = pack_gain_tokens(res.k_seq, res.big_k_seq)  # (window, m(1+n))
        x_err = x_seq - x_ref + state_offset  # (H+1, n)
        predicted = predict_fn(x_err, prompt)  # (H - window, m(1+n))
        k_head, big_k_head = unpack_gain_tokens(predicted, m, n)

        k_full = jnp.concatenate([k_head, res.k_seq], axis=0)
        big_k_full = jnp.concatenate([big_k_head, res.big_k_seq], axis=0)

        alphas = jnp.asarray(config.alphas, dtype=x_seq.dtype)
        found, alpha, new_x, new_u, new_cost = _line_search(config)(
            dynamics, cost, final_cost, x0, x_seq, u_seq, k_full, big_k_full,
            current_cost, alphas,
        )
        return found, alpha, new_x, new_u, new_cost, k_full, big_k_full

    def cond(state):
        _, _, _, _, _, iteration, done = state
        return jnp.logical_and(iteration < config.max_iter, jnp.logical_not(done))

    # Both lax.cond branches (hybrid iteration vs exact fallback iteration)
    # must carry identical dtypes, but mixed precision can split them (e.g.
    # f64 cost tables promote the exact path while predicted f32 gains keep
    # the hybrid path narrow). Promote BOTH branches to the wider dtype of
    # the pair — truncating the exact branch down would quantize the cost the
    # certification's |dJ| test runs against and could flip near-tol
    # termination decisions. Dtypes are resolved at trace time via eval_shape.
    if exact_fallback:
        hyb_s = jax.eval_shape(hybrid_iteration, x_init, u_init, cost_init)
        ex_s = jax.eval_shape(
            lambda xs, us, c: _ilqr_iteration(
                dynamics, cost, final_cost, config, x0, xs, us, c
            ),
            x_init, u_init, cost_init,
        )
        # Output order: found, alpha, new_x, new_u, new_cost, k, big_k.
        carry_dt = tuple(
            jnp.promote_types(h.dtype, e.dtype)
            for h, e in zip(hyb_s[2:7], ex_s[2:7])
        )
    else:
        carry_dt = (x_init.dtype, u_init.dtype, cost_init.dtype,
                    u_init.dtype, u_init.dtype)

    def body(state):
        x_seq, u_seq, current_cost, _, _, iteration, _ = state
        found, _, new_x, new_u, new_cost, k_seq, big_k_seq = hybrid_iteration(
            x_seq, u_seq, current_cost
        )
        would_stop = jnp.logical_or(
            jnp.logical_not(found), jnp.abs(current_cost - new_cost) < config.tol
        )
        if not exact_fallback:
            return (new_x, new_u, new_cost, k_seq, big_k_seq, iteration + 1, would_stop)

        def certify(_):
            # Redo this iteration exactly; terminate only if IT cannot improve.
            f2, _, nx2, nu2, nc2, k2, big_k2 = _ilqr_iteration(
                dynamics, cost, final_cost, config, x0, x_seq, u_seq, current_cost
            )
            done2 = jnp.logical_or(
                jnp.logical_not(f2), jnp.abs(current_cost - nc2) < config.tol
            )
            return (
                nx2.astype(carry_dt[0]),
                nu2.astype(carry_dt[1]),
                nc2.astype(carry_dt[2]),
                k2.astype(carry_dt[3]),
                big_k2.astype(carry_dt[4]),
                done2,
            )

        def keep(_):
            return (
                new_x.astype(carry_dt[0]),
                new_u.astype(carry_dt[1]),
                new_cost.astype(carry_dt[2]),
                k_seq.astype(carry_dt[3]),
                big_k_seq.astype(carry_dt[4]),
                jnp.asarray(False),
            )

        new_x, new_u, new_cost, k_seq, big_k_seq, done = jax.lax.cond(
            would_stop, certify, keep, None
        )
        return (new_x, new_u, new_cost, k_seq, big_k_seq, iteration + 1, done)

    zeros_k = jnp.zeros((horizon, m), dtype=carry_dt[3])
    zeros_big_k = jnp.zeros((horizon, m, n), dtype=carry_dt[4])
    init = (
        x_init.astype(carry_dt[0]),
        u_init.astype(carry_dt[1]),
        cost_init.astype(carry_dt[2]),
        zeros_k,
        zeros_big_k,
        jnp.asarray(0),
        jnp.asarray(False),
    )
    x_seq, u_seq, cost_val, k_seq, big_k_seq, iterations, done = jax.lax.while_loop(
        cond, body, init
    )
    return ILQRSolution(x_seq, u_seq, cost_val, iterations, done, k_seq, big_k_seq)
