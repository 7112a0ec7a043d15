"""Fused line-search rollout — all candidate step sizes in one Pallas kernel.

The line search (solver/rollout.py::line_search, semantics of
quattro_ilqr_tf.py:440-451) already evaluates every alpha as ONE vmapped
``lax.scan`` — but that scan is still an XLA while loop over H steps whose
per-step body is a handful of tiny (6, n)-shaped ops, so at MPC shapes the
wall-clock is per-step loop overhead, not arithmetic (same pathology the
fused backward pass removes — see ops/fused_riccati.py). This kernel runs
the whole closed-loop rollout

    u_t = u_ref_t + alpha * (k_t + K_t (x_t - x_ref_t));  x_{t+1} = f(x_t, u_t)

for ALL alphas simultaneously inside one VMEM-resident Pallas ``fori_loop``.

The user's dynamics callable is TRACED INTO the kernel: a Pallas kernel body
is ordinary JAX tracing, so any jnp-expressible plant (the framework's
contract already requires jittable dynamics) lowers into the kernel, with
two caveats handled here:

- per-component scalar intermediates inside the plant (``x[6]``,
  ``jnp.stack``-built vectors) would become 1-D values under a single vmap;
  Mosaic's vector layouts want >= 2-D, so the state is carried as
  ``(1, A, n)`` and the plant is mapped with a DOUBLE vmap — every
  intermediate becomes a (1, A) tile;
- ops outside Mosaic's lowering set simply fail to compile, in which case
  the caller falls back to the XLA scan form (``ILQRConfig.linesearch``
  stays ``"xla"`` by default; ``"fused"`` is the opt-in fast path).

Costs are NOT computed in-kernel: with (A, H) candidate trajectories
materialized, the cost reduction is embarrassingly parallel and XLA-friendly
(one vmapped sum outside), and keeping the user's cost callable out of the
kernel halves the lowering surface.

This is the "fused linesearch rollout" kernel named by SURVEY.md §8.1.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def fused_feedback_rollouts(
    dynamics: Dynamics,
    x0: jnp.ndarray,  # (n,)
    x_ref_seq: jnp.ndarray,  # (H+1, n) (only the first H rows are read)
    u_ref_seq: jnp.ndarray,  # (H, m)
    k_seq: jnp.ndarray,  # (H, m)
    big_k_seq: jnp.ndarray,  # (H, m, n)
    alphas: jnp.ndarray,  # (A,)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-alpha closed-loop rollouts in one VMEM-resident kernel.

    Returns ``(cand_x (A, H+1, n), cand_u (A, H, m))`` — identical contents
    to ``vmap(feedback_rollout)`` over the alpha axis (exact in f64; f32
    differences are the usual reassociation noise).
    """
    horizon, m = u_ref_seq.shape
    n = x0.shape[0]
    n_alpha = alphas.shape[0]
    dtype = x0.dtype

    # Host-side prep: keep every per-step ref row 2-D inside the kernel
    # ((1, n) / (1, m) rows broadcast against the (A, .) state), and
    # pre-transpose K so the feedback term is one (A, n) @ (n, m) dot.
    xref_rows = x_ref_seq[:horizon, None, :]  # (H, 1, n)
    uref_rows = u_ref_seq[:, None, :]  # (H, 1, m)
    k_rows = k_seq[:, None, :]  # (H, 1, m)
    bigk_t = jnp.swapaxes(big_k_seq, -1, -2)  # (H, n, m)
    alpha_col = alphas[:, None].astype(dtype)  # (A, 1)

    # Plants routinely close over arrays (parameter vectors, trim points);
    # Pallas kernel bodies may not capture array constants, so hoist them to
    # explicit kernel inputs exactly as the whole-solve kernel does.
    from quattro_tpu.ops.fused_solve import _hoist_array_constants

    dyn_conv, dyn_consts = _hoist_array_constants(
        dynamics,
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((m,), dtype),
    )
    const_shapes = [jnp.shape(c) for c in dyn_consts]
    const_rows = [jnp.reshape(jnp.asarray(c), (1, -1)) for c in dyn_consts]

    def kernel(x0_r, xref_r, uref_r, k_r, bigkt_r, alpha_r, *refs):
        const_refs = refs[: len(dyn_consts)]
        x_out, u_out = refs[len(dyn_consts) :]
        const_vals = [
            jnp.reshape(r[...], shp) for r, shp in zip(const_refs, const_shapes)
        ]
        step_fn = jax.vmap(jax.vmap(lambda x, u: dyn_conv(x, u, *const_vals)))

        x_init = jnp.broadcast_to(x0_r[...], (n_alpha, n))
        x_out[0] = x_init

        def step(t, x):
            du = k_r[t] + jnp.dot(
                x - xref_r[t],
                bigkt_r[t],
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )  # (A, m)
            u = uref_r[t] + alpha_r[...] * du
            x_next = step_fn(x[None], u[None])[0]
            u_out[t] = u
            x_out[t + 1] = x_next
            return x_next

        jax.lax.fori_loop(0, horizon, step, x_init)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x_tm, u_tm = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((horizon + 1, n_alpha, n), dtype),
            jax.ShapeDtypeStruct((horizon, n_alpha, m), dtype),
        ],
        in_specs=[vmem() for _ in range(6 + len(dyn_consts))],
        out_specs=[vmem() for _ in range(2)],
        interpret=interpret,
    )(x0[None, :], xref_rows, uref_rows, k_rows, bigk_t, alpha_col, *const_rows)

    # Time-major (dynamic leading-index stores) -> candidate-major.
    return jnp.swapaxes(x_tm, 0, 1), jnp.swapaxes(u_tm, 0, 1)
