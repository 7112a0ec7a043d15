"""Trajectory-batch parallel iLQR: vmap + mesh sharding.

Replaces the reference's 10-process data-collection pool
(examples/cartpole/training/training_data_collection.py:303-318) with
thousands of trajectories solved per device dispatch: ``vmap`` over (x0,
u_init) batches, sharded over the mesh's ``traj`` axis so each device solves
its shard and only converged-cost reductions cross the interconnect.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused_auto
from quattro_tpu.solver.derivatives import (
    linearize_dynamics,
    quadratize_cost,
    quadratize_final_cost,
)
from quattro_tpu.solver.ilqr import ILQRConfig, ILQRSolution, ilqr_solve
from quattro_tpu.solver.rollout import line_search, simulate, trajectory_cost


def _fused_backend_applies(config: ILQRConfig, x0_batch, u_init_batch) -> bool:
    """The fused Pallas backward pass handles: TPU backend, f32 data, a batch
    wide enough to fill lanes usefully, small (n, m), static reg (the LM
    mu-schedule traces reg, which the kernel bakes as a literal).

    It also requires the solver config on its DEFAULT algorithm knobs: a
    user who pins ``riccati=``/``parallel_riccati``/``linesearch`` is asking
    for a specific algorithm (for reproducibility or A/B measurement), and
    "auto" must not silently substitute the fused sequential-law kernel —
    whose f32 summation order differs — for the requested form."""
    n = x0_batch.shape[-1]
    m = u_init_batch.shape[-1]
    return (
        jax.default_backend() == "tpu"
        and x0_batch.dtype == jnp.float32
        and u_init_batch.dtype == jnp.float32
        and x0_batch.shape[0] >= 8
        and n <= 16
        and m <= 8
        and not config.adaptive_reg
        and config.riccati == "auto"
        and config.parallel_riccati is None
        # linesearch="fused" composes: the batched iteration swaps its
        # vmapped-scan rollouts for the batched rollout kernel
        # (ops/fused_rollout.py::fused_feedback_rollouts_batched).
        and config.linesearch in ("xla", "fused")
    )


def batched_ilqr_solve(
    dynamics: Callable,
    cost: Callable,
    final_cost: Callable,
    x0_batch: jnp.ndarray,  # (B, n)
    u_init_batch: jnp.ndarray,  # (B, H, m)
    config: ILQRConfig = ILQRConfig(),
    riccati_backend: str = "auto",
) -> ILQRSolution:
    """Solve a batch of independent iLQR problems in one computation.

    Two implementations with identical accept/convergence semantics:

    - ``riccati_backend="fused"`` (chosen by ``"auto"`` on TPU, f32,
      B >= 8): an explicitly-batched iteration whose backward pass is the
      single fused Pallas kernel (``ops/fused_riccati.py``, 4.5x over the
      vmapped scan at the pod-feed shape). Lane masking reproduces vmapped
      ``while_loop`` behavior: all lanes run until every lane converges,
      converged lanes' carries frozen.
    - ``riccati_backend="vmap"``: ``vmap(ilqr_solve)`` — vmap of while_loop
      masks finished lanes itself; wall-clock = slowest problem. The real
      batch width is injected as the ``riccati="auto"`` dispatch hint so the
      vmapped solve picks the sequential backward form (the associative
      combine costs ~12x a plain Riccati step once the batch fills the MXU).

    The two backends are identical in exact arithmetic (verified exactly in
    f64, tests/test_fused_riccati.py); in f32 their different summation
    orders can flip a near-tie line-search accept on individual lanes after
    several iterations (measured on TPU: max rel cost diff 2e-5 after 1
    iteration, with rare per-lane divergence after 6 — both results are
    valid solver trajectories).
    """
    if riccati_backend not in ("auto", "fused", "fused_bf16", "vmap"):
        raise ValueError(f"Unknown riccati_backend: {riccati_backend!r}")
    if riccati_backend in ("fused", "fused_bf16"):
        # Forcing the kernel must be as loud as the auto dispatch is careful:
        # a pinned algorithm knob would be silently substituted (the fused
        # body always runs the sequential update law + XLA line search), and
        # the kernel's applicability limits die as opaque Mosaic errors.
        if config.adaptive_reg:
            raise ValueError(
                f"riccati_backend={riccati_backend!r} bakes reg into the kernel "
                "as a literal; the adaptive LM mu-schedule needs "
                "riccati_backend='vmap'"
            )
        if config.riccati != "auto" or config.parallel_riccati is not None:
            raise ValueError(
                f"riccati_backend={riccati_backend!r} runs the fused "
                "sequential-law kernel; pinned riccati=/parallel_riccati "
                "settings conflict — use riccati_backend='vmap'"
            )
        n, m = x0_batch.shape[-1], u_init_batch.shape[-1]
        if n > 16 or m > 8:
            raise ValueError(
                f"riccati_backend={riccati_backend!r} supports n <= 16, m <= 8 "
                f"(got n={n}, m={m})"
            )
        if jax.default_backend() == "tpu" and x0_batch.dtype != jnp.float32:
            raise ValueError(
                f"riccati_backend={riccati_backend!r} on TPU requires float32 "
                f"data (got {x0_batch.dtype})"
            )
    use_fused = riccati_backend in ("fused", "fused_bf16") or (
        riccati_backend == "auto" and _fused_backend_applies(config, x0_batch, u_init_batch)
    )
    if use_fused:
        # Off-TPU a forced "fused" runs the kernel in interpret mode (slow —
        # for tests), matching every other fused entry point.
        # "fused_bf16": stage inputs streamed bf16 with f32 carry/arithmetic
        # — 1.33x at pod scale for a ~1e-3 relative gain-error band
        # (BASELINE.md r4 tile sweep). NEVER auto-selected: quantized inputs
        # are an accuracy opt-in.
        return _batched_ilqr_solve_fused(
            dynamics, cost, final_cost, x0_batch, u_init_batch, config,
            interpret=jax.default_backend() != "tpu",
            stream_dtype=jnp.bfloat16 if riccati_backend == "fused_bf16" else None,
        )
    if config.parallel_riccati is None and config.riccati == "auto":
        config = config._replace(batch_hint=max(config.batch_hint, x0_batch.shape[0]))
    solve = partial(ilqr_solve, dynamics, cost, final_cost, config=config)
    return jax.vmap(solve)(x0_batch, u_init_batch)


def _batched_ilqr_solve_fused(
    dynamics: Callable,
    cost: Callable,
    final_cost: Callable,
    x0_batch: jnp.ndarray,
    u_init_batch: jnp.ndarray,
    config: ILQRConfig,
    interpret: bool = False,
    stream_dtype=None,
) -> ILQRSolution:
    """Explicitly-batched iLQR loop around the fused backward-pass kernel.

    Semantics mirror ``jax.vmap(ilqr_solve)`` exactly (which masks finished
    lanes via the while_loop batching rule): one shared trip counter, lanes
    that are done keep their carry frozen, per-lane iteration counts.
    """
    x_init = jax.vmap(lambda x0, u: simulate(dynamics, x0, u))(x0_batch, u_init_batch)
    cost_init = jax.vmap(lambda xs, us: trajectory_cost(cost, final_cost, xs, us))(
        x_init, u_init_batch
    )
    batch, horizon, m = u_init_batch.shape
    n = x0_batch.shape[-1]
    alphas = jnp.asarray(config.alphas, dtype=x_init.dtype)

    if config.linesearch == "fused":
        from quattro_tpu.solver.rollout import line_search_batched_fused

        def run_line_search(xs, us, k, big_k, cs):
            return line_search_batched_fused(
                dynamics, cost, final_cost, x0_batch, xs, us, k, big_k, cs,
                alphas, interpret=interpret,
            )
    else:

        def run_line_search(xs, us, k, big_k, cs):
            return jax.vmap(
                lambda x0, x, u, kk, kb, c: line_search(
                    dynamics, cost, final_cost, x0, x, u, kk, kb, c, alphas,
                    unroll=config.linesearch_unroll,
                    fuse_cost=config.linesearch_fuse_cost,
                )
            )(x0_batch, xs, us, k, big_k, cs)

    def cond(state):
        trip, done = state[5], state[6]
        return jnp.logical_and(trip < config.max_iter, jnp.logical_not(jnp.all(done)))

    def body(state):
        xs, us, cs, ks, big_ks, trip, done, iters = state
        a, b = jax.vmap(lambda x, u: linearize_dynamics(dynamics, x, u))(xs, us)
        exp = jax.vmap(lambda x, u: quadratize_cost(cost, x, u))(xs, us)
        fexp = jax.vmap(lambda x: quadratize_final_cost(final_cost, x))(xs[:, -1])
        # Width-dispatched: batch2d kernel at B >= 1024 (1.3-1.7x, r5),
        # column-major kernel below.
        k, big_k = riccati_backward_batched_fused_auto(
            a, b, exp, fexp.v_x, fexp.v_xx, config.reg, interpret=interpret,
            stream_dtype=stream_dtype,
        )
        found, _, new_x, new_u, new_cost = run_line_search(xs, us, k, big_k, cs)

        active = jnp.logical_not(done)

        def sel(new, old):
            mask = active.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        now_done = jnp.logical_or(
            jnp.logical_not(found), jnp.abs(cs - new_cost) < config.tol
        )
        return (
            sel(new_x, xs),
            sel(new_u, us),
            jnp.where(active, new_cost, cs),
            sel(k, ks),
            sel(big_k, big_ks),
            trip + 1,
            jnp.logical_or(done, now_done),
            iters + active.astype(iters.dtype),
        )

    init = (
        x_init,
        u_init_batch,
        cost_init,
        jnp.zeros((batch, horizon, m), dtype=u_init_batch.dtype),
        jnp.zeros((batch, horizon, m, n), dtype=u_init_batch.dtype),
        jnp.asarray(0),
        jnp.zeros((batch,), dtype=bool),
        jnp.zeros((batch,), dtype=jnp.int32),
    )
    xs, us, cs, ks, big_ks, _, done, iters = jax.lax.while_loop(cond, body, init)
    return ILQRSolution(xs, us, cs, iters, done, ks, big_ks)


def sharded_ilqr_solve(
    dynamics: Callable,
    cost: Callable,
    final_cost: Callable,
    x0_batch: jnp.ndarray,
    u_init_batch: jnp.ndarray,
    mesh: Mesh,
    config: ILQRConfig = ILQRConfig(),
    axis: str = "traj",
) -> ILQRSolution:
    """Batch solve with the batch axis sharded over the mesh.

    The batch size must be divisible by the ``traj`` axis size. Built on
    ``shard_map``, so each device executes ``batched_ilqr_solve`` on its
    LOCAL shard — no cross-device communication by construction
    (embarrassingly parallel, like the reference's process pool but on the
    ICI-connected mesh), and the fused-backend auto dispatch sees the local
    shard width. GSPMD sharding propagation alone cannot do this: a
    ``pallas_call`` has no partitioning rule, so the fused kernel under
    plain ``jit`` would force a gather + replicated execution.

    Two shard-local semantics notes (both match ``vmap(ilqr_solve)`` per
    lane): each shard iterates until ITS lanes converge (no cross-shard
    trip-count sync — faster, same per-lane results), and the vmap path's
    ``riccati="auto"`` batch hint is the local width.
    """
    spec = PartitionSpec(axis)
    sharding = NamedSharding(mesh, spec)
    x0_sharded = jax.device_put(x0_batch, sharding)
    u_sharded = jax.device_put(u_init_batch, sharding)

    solve = partial(batched_ilqr_solve, dynamics, cost, final_cost, config=config)
    out_specs = ILQRSolution(
        x_seq=spec,
        u_seq=spec,
        cost=spec,
        iterations=spec,
        converged=spec,
        k_seq=spec,
        big_k_seq=spec,
    )
    # check_vma=False: the body is shard-local with zero collectives, and the
    # solver's while_loop carries start as unvarying zeros (the vma checker
    # would demand pcast shims inside core solver code for no semantic gain).
    mapped = jax.shard_map(
        solve, mesh=mesh, in_specs=(spec, spec), out_specs=out_specs, check_vma=False
    )
    return jax.jit(mapped)(x0_sharded, u_sharded)
