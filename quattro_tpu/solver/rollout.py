"""Forward rollouts and the batched first-accept line search.

Replaces the reference's sequential Python rollouts
(quattro_ilqr_tf/quattro_ilqr_tf.py:127-143, 376-417) with ``lax.scan``, and
its sequential early-exit line search (:440-451) with ONE batched evaluation of
all step sizes (vmap over alpha) followed by a first-accepting-index select —
identical accept semantics (first alpha with cost <= current), constant
compiled shape, and all six rollouts run as a single batched computation.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
RunningCost = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
FinalCost = Callable[[jnp.ndarray], jnp.ndarray]

# Reference line-search schedule (quattro_ilqr_tf.py:440).
DEFAULT_ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01)


def simulate(dynamics: Dynamics, x0: jnp.ndarray, u_seq: jnp.ndarray) -> jnp.ndarray:
    """Roll the open-loop control sequence forward: returns (H+1, n) states.

    Semantics: quattro_ilqr_tf.py:127-132.
    """

    def step(x, u):
        x_next = dynamics(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, u_seq)
    return jnp.concatenate([x0[None], xs], axis=0)


def trajectory_cost(
    cost: RunningCost,
    final_cost: FinalCost,
    x_seq: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> jnp.ndarray:
    """Total cost sum_t L(x_t, u_t) + Lf(x_H) (quattro_ilqr_tf.py:138-143)."""
    running = jnp.sum(jax.vmap(cost)(x_seq[:-1], u_seq))
    return running + final_cost(x_seq[-1])


def feedback_rollout(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    x_ref_seq: jnp.ndarray,
    u_ref_seq: jnp.ndarray,
    k_seq: jnp.ndarray,
    big_k_seq: jnp.ndarray,
    alpha: jnp.ndarray,
    unroll: int = 1,
    fuse_cost: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-loop rollout ``u_t = u_ref_t + alpha (k_t + K_t (x_t - x_ref_t))``.

    Semantics: quattro_ilqr_tf.py:376-390. Returns (x_seq, u_seq, total_cost).

    ``unroll``: ``lax.scan`` unroll factor — identical numerics, fewer loop
    trips. At batched shapes the per-step tensors are tiny ((B*A, n) rows)
    and the XLA while-loop's per-trip overhead dominates the phase; unrolling
    amortizes it (``ILQRConfig.linesearch_unroll`` threads it through the
    batched solve).

    ``fuse_cost``: accumulate the running cost INSIDE the rollout scan (the
    stage cost fuses into the step's elementwise chain) instead of a second
    pass re-reading the materialized (H, n)/(H, m) trajectories from HBM.
    Same value up to f32 summation order (sequential accumulation vs the
    second pass's sum over a stacked axis) — a near-tie line-search accept
    can flip, the same caveat class as every other summation-order knob in
    this solver. Off by default.
    """

    if fuse_cost:

        def step_fc(carry, inp):
            x, acc = carry
            x_ref, u_ref, k, big_k = inp
            du = k + big_k @ (x - x_ref)
            u = u_ref + alpha * du
            x_next = dynamics(x, u)
            return (x_next, acc + cost(x, u)), (x_next, u)

        (x_last, run_total), (xs, us) = jax.lax.scan(
            step_fc,
            (x0, jnp.zeros((), x0.dtype)),
            (x_ref_seq[:-1], u_ref_seq, k_seq, big_k_seq),
            unroll=unroll,
        )
        x_seq = jnp.concatenate([x0[None], xs], axis=0)
        return x_seq, us, run_total + final_cost(x_last)

    def step(x, inp):
        x_ref, u_ref, k, big_k = inp
        du = k + big_k @ (x - x_ref)
        u = u_ref + alpha * du
        x_next = dynamics(x, u)
        return x_next, (x_next, u)

    _, (xs, us) = jax.lax.scan(
        step, x0, (x_ref_seq[:-1], u_ref_seq, k_seq, big_k_seq), unroll=unroll
    )
    x_seq = jnp.concatenate([x0[None], xs], axis=0)
    total = trajectory_cost(cost, final_cost, x_seq, us)
    return x_seq, us, total


def line_search(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    x_ref_seq: jnp.ndarray,
    u_ref_seq: jnp.ndarray,
    k_seq: jnp.ndarray,
    big_k_seq: jnp.ndarray,
    current_cost: jnp.ndarray,
    alphas: jnp.ndarray,
    unroll: int = 1,
    fuse_cost: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched backtracking line search with first-accept semantics.

    All candidate step sizes are rolled out in ONE vmapped computation; the
    chosen candidate is the FIRST (largest) alpha whose cost does not exceed
    ``current_cost`` — byte-identical accept logic to the reference's
    sequential loop (quattro_ilqr_tf.py:440-451) with none of its sequential
    latency. ``unroll``/``fuse_cost``: see :func:`feedback_rollout`.

    Returns:
        (found, chosen_alpha, new_x_seq, new_u_seq, new_cost); when no
        candidate is accepted, the reference trajectory and current cost are
        returned unchanged with found=False.
    """

    def rollout(alpha):
        return feedback_rollout(
            dynamics, cost, final_cost, x0, x_ref_seq, u_ref_seq, k_seq,
            big_k_seq, alpha, unroll=unroll, fuse_cost=fuse_cost,
        )

    cand_x, cand_u, cand_cost = jax.vmap(rollout)(alphas)
    return _first_accept_select(
        cand_x, cand_u, cand_cost, x_ref_seq, u_ref_seq, current_cost, alphas
    )


def line_search_fused(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0: jnp.ndarray,
    x_ref_seq: jnp.ndarray,
    u_ref_seq: jnp.ndarray,
    k_seq: jnp.ndarray,
    big_k_seq: jnp.ndarray,
    current_cost: jnp.ndarray,
    alphas: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``line_search`` with the rollouts run as ONE Pallas kernel.

    Same accept semantics and return contract; the all-alpha closed-loop
    rollout happens inside a single VMEM-resident kernel that the user's
    dynamics are traced into (ops/fused_rollout.py — removes the XLA
    while-loop per-step overhead that dominates at MPC shapes). Candidate
    costs and the first-accept select stay in XLA (fully parallel).
    Off-TPU the kernel runs in interpret mode (tests); select via
    ``ILQRConfig(linesearch="fused")``.
    """
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts

    interpret = jax.default_backend() != "tpu"
    cand_x, cand_u = fused_feedback_rollouts(
        dynamics, x0, x_ref_seq, u_ref_seq, k_seq, big_k_seq, alphas,
        interpret=interpret,
    )
    cand_cost = jax.vmap(lambda xs, us: trajectory_cost(cost, final_cost, xs, us))(
        cand_x, cand_u
    )
    return _first_accept_select(
        cand_x, cand_u, cand_cost, x_ref_seq, u_ref_seq, current_cost, alphas
    )


def line_search_batched_fused(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0_batch: jnp.ndarray,  # (B, n)
    x_ref_batch: jnp.ndarray,  # (B, H+1, n)
    u_ref_batch: jnp.ndarray,  # (B, H, m)
    k_batch: jnp.ndarray,  # (B, H, m)
    big_k_batch: jnp.ndarray,  # (B, H, m, n)
    current_cost: jnp.ndarray,  # (B,)
    alphas: jnp.ndarray,  # (A,)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched-trajectory ``line_search`` with all rollouts in ONE kernel.

    The batched-regime analogue of ``line_search_fused``: every (alpha,
    trajectory) rollout runs inside one Pallas kernel with the batch on the
    lane axis (ops/fused_rollout.py::fused_feedback_rollouts_batched);
    candidate costs and the per-trajectory first-accept select stay in XLA.
    Same accept semantics as ``vmap(line_search)`` over the batch. Returns
    batched (found (B,), chosen_alpha (B,), new_x (B, H+1, n),
    new_u (B, H, m), new_cost (B,)).
    """
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched

    cand_x, cand_u = fused_feedback_rollouts_batched(
        dynamics, x0_batch, x_ref_batch, u_ref_batch, k_batch, big_k_batch,
        alphas, interpret=interpret,
    )
    traj_cost = lambda xs, us: trajectory_cost(cost, final_cost, xs, us)
    cand_cost = jax.vmap(jax.vmap(traj_cost))(cand_x, cand_u)  # (A, B)
    return jax.vmap(
        _first_accept_select, in_axes=(1, 1, 1, 0, 0, 0, None)
    )(cand_x, cand_u, cand_cost, x_ref_batch, u_ref_batch, current_cost, alphas)


def line_search_batched2d(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x0_batch: jnp.ndarray,  # (B, n)
    x_ref_batch: jnp.ndarray,  # (B, H+1, n)
    u_ref_batch: jnp.ndarray,  # (B, H, m)
    k_batch: jnp.ndarray,  # (B, H, m)
    big_k_batch: jnp.ndarray,  # (B, H, m, n)
    current_cost: jnp.ndarray,  # (B,)
    alphas: jnp.ndarray,  # (A,)
    interpret: bool = False,
    tile_s: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``line_search_batched_fused`` with the batch2d (transposed) kernel.

    Same contract; the rollouts run in the r5 kernel that packs the
    (alpha, batch) pair axis onto sublanes AND lanes
    (ops/fused_rollout.py::fused_feedback_rollouts_batched2d) instead of the
    alphas-on-sublanes layout that measured 3-5x slower than XLA. Costs and
    the per-trajectory first-accept select stay in XLA.

    On hardware ``tile_s`` defaults to 8 (full f32 vregs): sub-vreg tiles
    stall the Mosaic binary compile (the batch2d backward kernel's measured
    boundary, BASELINE.md r5), and the kernel pads the (alpha, batch) pair
    axis up to a whole chunk internally, so a narrow feed still runs — it
    just wastes the padded sublanes. Interpret mode keeps the natural width.
    """
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched2d

    if tile_s is None and not interpret:
        tile_s = 8
    cand_x, cand_u = fused_feedback_rollouts_batched2d(
        dynamics, x0_batch, x_ref_batch, u_ref_batch, k_batch, big_k_batch,
        alphas, interpret=interpret, tile_s=tile_s,
    )
    traj_cost = lambda xs, us: trajectory_cost(cost, final_cost, xs, us)
    cand_cost = jax.vmap(jax.vmap(traj_cost))(cand_x, cand_u)  # (A, B)
    return jax.vmap(
        _first_accept_select, in_axes=(1, 1, 1, 0, 0, 0, None)
    )(cand_x, cand_u, cand_cost, x_ref_batch, u_ref_batch, current_cost, alphas)


def _first_accept_select(cand_x, cand_u, cand_cost, x_ref_seq, u_ref_seq, current_cost, alphas):
    accepted = cand_cost <= current_cost
    found = jnp.any(accepted)
    # argmax over bool returns the first True; alphas are ordered descending.
    idx = jnp.argmax(accepted)

    new_x = jnp.where(found, cand_x[idx], x_ref_seq)
    new_u = jnp.where(found, cand_u[idx], u_ref_seq)
    new_cost = jnp.where(found, cand_cost[idx], current_cost)
    chosen_alpha = jnp.where(found, alphas[idx], 0.0)
    return found, chosen_alpha, new_x, new_u, new_cost
