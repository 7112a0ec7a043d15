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
import numpy as np

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
    # Natural shape for matrix consts; (1, -1) rows only for 0/1-D (see
    # ops/fused_solve.py — Mosaic rejects (1, r*c) -> (r, c) reshapes at
    # compile time).
    const_rows = [
        jnp.asarray(c) if np.ndim(c) >= 2 else jnp.reshape(jnp.asarray(c), (1, -1))
        for c in dyn_consts
    ]

    def kernel(x0_r, xref_r, uref_r, k_r, bigkt_r, alpha_r, *refs):
        const_refs = refs[: len(dyn_consts)]
        x_out, u_out = refs[len(dyn_consts) :]
        const_vals = [
            r[...] if r.shape == shp else jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
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


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


_LANE = 128


def fused_feedback_rollouts_batched2d(
    dynamics: Dynamics,
    x0: jnp.ndarray,  # (B, n)
    x_ref_seq: jnp.ndarray,  # (B, H+1, n) (only the first H rows are read)
    u_ref_seq: jnp.ndarray,  # (B, H, m)
    k_seq: jnp.ndarray,  # (B, H, m)
    big_k_seq: jnp.ndarray,  # (B, H, m, n)
    alphas: jnp.ndarray,  # (A,)
    interpret: bool = False,
    tile_s: int | None = None,
    block_t: int = 4,
    max_resident: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-alpha batched rollouts with (alpha, batch) packed on sublanes+lanes.

    The first batched rollout kernel (``fused_feedback_rollouts_batched``)
    measured 3-5x SLOWER than the vmapped XLA scan (BASELINE.md r2 negative):
    its (A, tile_b) tiles leave sublanes idle (A=6 of 8) and — the dominant
    loss — it SERIALIZES batch tiles through the grid, so B=512 runs 4x H
    dependent plant-evaluation chains where XLA runs H chains on one wide
    (B*A, n) tensor. This kernel is the r3-verdict "transposed layout":

    - the (alpha, batch) pair axis (P = A*B) is packed onto sublanes AND
      lanes — every state/control COMPONENT is one (tile_s, 128) tile of
      tile_s*128 independent rollouts (full f32 vregs at tile_s=8);
    - up to ``max_resident`` pair-tiles stay VMEM-resident per horizon step
      and advance inside one fori_loop iteration — their plant chains
      INTERLEAVE (hiding op latency) instead of serializing grid passes;
    - the feedback term is a leading-axis tensor contraction (one mul + one
      axis-reduce), and the user's plant is traced in with the same
      components-first double vmap as the other rollout kernels, so every
      scalar intermediate becomes a (tile_s, 128) tile.

    Host-side the per-step refs are broadcast over alpha (x A HBM traffic —
    megabytes at the canonical shapes, microseconds at HBM bandwidth, vs the
    milliseconds of per-step overhead removed). Costs are evaluated OUTSIDE
    the kernel (see ``fused_feedback_rollouts``'s rationale).

    Returns ``(cand_x (A, B, H+1, n), cand_u (A, B, H, m))`` — identical
    contents to ``vmap(vmap(feedback_rollout))`` over (alpha, batch) up to
    f32 reassociation noise.
    """
    batch, horizon, m = u_ref_seq.shape
    n = x0.shape[-1]
    n_alpha = alphas.shape[0]
    dtype = x0.dtype
    pairs = n_alpha * batch
    if tile_s is None:
        tile_s = max(1, min(8, -(-pairs // _LANE)))
    chunk = tile_s * _LANE

    p_pad = _round_up(max(pairs, chunk), chunk)
    nb = p_pad // chunk
    nb_in = min(nb, max_resident)
    while nb % nb_in:
        nb_in -= 1
    nb_out = nb // nb_in
    h_pad = _round_up(horizon, block_t)
    n_hblocks = h_pad // block_t

    def pair_pad(x):  # (P, ...) -> (p_pad, ...), zero fill
        if p_pad == pairs:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((p_pad - pairs,) + x.shape[1:], x.dtype)], axis=0
        )

    def h_append(x):  # (P_pad, H, e) -> (P_pad, h_pad, e), zero fill
        if h_pad == horizon:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((x.shape[0], h_pad - horizon) + x.shape[2:], x.dtype)],
            axis=1,
        )

    def bcast(x):  # (B, H, ...) -> (A*B, H, ...), alpha-major pairs
        return jnp.broadcast_to(x[None], (n_alpha,) + x.shape).reshape(
            (pairs,) + x.shape[1:]
        )

    def pack(x):  # (p_pad, h_pad, e...) -> (nb_out * h_pad, nb_in * e, S, L)
        e = int(np.prod(x.shape[2:])) if x.ndim > 2 else 1
        xr = x.reshape(nb_out, nb_in, tile_s, _LANE, h_pad, e)
        return jnp.transpose(xr, (0, 4, 1, 5, 2, 3)).reshape(
            nb_out * h_pad, nb_in * e, tile_s, _LANE
        )

    def pack_static(x):  # (p_pad, e...) -> (nb_out * (nb_in * e), S, L)
        e = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        xr = x.reshape(nb_out, nb_in, tile_s, _LANE, e)
        return jnp.transpose(xr, (0, 1, 4, 2, 3)).reshape(
            nb_out * nb_in * e, tile_s, _LANE
        )

    xref_pk = pack(h_append(pair_pad(bcast(x_ref_seq[:, :horizon]))))
    uref_pk = pack(h_append(pair_pad(bcast(u_ref_seq))))
    k_pk = pack(h_append(pair_pad(bcast(k_seq))))
    bigk_pk = pack(h_append(pair_pad(bcast(big_k_seq))))
    x0_pk = pack_static(pair_pad(bcast(x0[:, None, :])[:, 0]))
    alpha_pairs = jnp.broadcast_to(
        alphas[:, None].astype(dtype), (n_alpha, batch)
    ).reshape(pairs)
    alpha_pk = pack_static(pair_pad(alpha_pairs))

    from quattro_tpu.ops.fused_solve import _hoist_array_constants

    dyn_conv, dyn_consts = _hoist_array_constants(
        dynamics,
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((m,), dtype),
    )
    const_shapes = [jnp.shape(c) for c in dyn_consts]
    const_rows = [
        jnp.asarray(c) if np.ndim(c) >= 2 else jnp.reshape(jnp.asarray(c), (1, -1))
        for c in dyn_consts
    ]

    def kernel(x0_r, alpha_r, xref_r, uref_r, k_r, bigk_r, *refs):
        from jax.experimental import pallas as pl

        const_refs = refs[: len(dyn_consts)]
        x_out, u_out = refs[len(dyn_consts): len(dyn_consts) + 2]
        x_s = refs[-1]  # scratch (nb_in * n, S, L)
        const_vals = [
            r[...] if r.shape == shp else jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
        ]
        # Components-first double vmap: x (n, S, L) -> intermediates (S, L).
        step_fn = jax.vmap(
            jax.vmap(
                lambda x, u: dyn_conv(x, u, *const_vals),
                in_axes=(-1, -1), out_axes=-1,
            ),
            in_axes=(1, 1), out_axes=1,
        )

        @pl.when(pl.program_id(1) == 0)
        def _init():
            x_s[...] = x0_r[...]

        alpha = [
            alpha_r[q] for q in range(nb_in)
        ]  # per-pair-tile (S, L) step sizes

        def step(tt, _):
            kk = k_r[tt].reshape(nb_in, m, tile_s, _LANE)
            bigk = bigk_r[tt].reshape(nb_in, m, n, tile_s, _LANE)
            xref = xref_r[tt].reshape(nb_in, n, tile_s, _LANE)
            uref = uref_r[tt].reshape(nb_in, m, tile_s, _LANE)
            x = x_s[...].reshape(nb_in, n, tile_s, _LANE)
            x_next_q = []
            u_q = []
            for q in range(nb_in):  # resident pair-tiles: chains interleave
                dx = x[q] - xref[q]  # (n, S, L)
                du = kk[q] + jnp.sum(bigk[q] * dx[None, :], axis=1)  # (m, S, L)
                u = uref[q] + alpha[q][None] * du
                x_next_q.append(step_fn(x[q], u))
                u_q.append(u)
            x_next = jnp.stack(x_next_q, axis=0)
            u_all = jnp.stack(u_q, axis=0)
            x_out[tt] = x_next.reshape(nb_in * n, tile_s, _LANE)
            u_out[tt] = u_all.reshape(nb_in * m, tile_s, _LANE)
            x_s[...] = x_next.reshape(nb_in * n, tile_s, _LANE)
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (nb_out, n_hblocks)

    def sspec(e):  # per-step tensors, FORWARD time order
        return pl.BlockSpec(
            (block_t, nb_in * e, tile_s, _LANE),
            lambda qb, ih: (qb * n_hblocks + ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def stat_spec(e):
        return pl.BlockSpec(
            (nb_in * e, tile_s, _LANE), lambda qb, ih: (qb, 0, 0),
            memory_space=pltpu.VMEM,
        )

    x_pk, u_pk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            stat_spec(n),  # x0
            stat_spec(1),  # alpha
            sspec(n),  # xref
            sspec(m),  # uref
            sspec(m),  # k
            sspec(m * n),  # big K
        ]
        + [
            pl.BlockSpec(c.shape, lambda qb, ih: (0, 0), memory_space=pltpu.VMEM)
            for c in const_rows
        ],
        out_specs=[
            sspec(n),  # x after each step
            sspec(m),  # u
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_out * h_pad, nb_in * n, tile_s, _LANE), dtype),
            jax.ShapeDtypeStruct((nb_out * h_pad, nb_in * m, tile_s, _LANE), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nb_in * n, tile_s, _LANE), dtype)],
        interpret=interpret,
    )(x0_pk, alpha_pk, xref_pk, uref_pk, k_pk, bigk_pk, *const_rows)

    def unpack(x, e):  # inverse of pack: -> (A, B, H, e)
        xr = x.reshape(nb_out, h_pad, nb_in, e, tile_s, _LANE)
        out = jnp.transpose(xr, (0, 2, 4, 5, 1, 3)).reshape(p_pad, h_pad, e)
        return out[:pairs, :horizon].reshape(n_alpha, batch, horizon, e)

    x_steps = unpack(x_pk, n)  # states AFTER each step
    u_steps = unpack(u_pk, m)
    x0_bc = jnp.broadcast_to(x0[None, :, None, :], (n_alpha, batch, 1, n))
    cand_x = jnp.concatenate([x0_bc, x_steps], axis=2)  # (A, B, H+1, n)
    return cand_x, u_steps


def fused_feedback_rollouts_batched(
    dynamics: Dynamics,
    x0: jnp.ndarray,  # (B, n)
    x_ref_seq: jnp.ndarray,  # (B, H+1, n) (only the first H rows are read)
    u_ref_seq: jnp.ndarray,  # (B, H, m)
    k_seq: jnp.ndarray,  # (B, H, m)
    big_k_seq: jnp.ndarray,  # (B, H, m, n)
    alphas: jnp.ndarray,  # (A,)
    interpret: bool = False,
    tile_b: int = 128,
    block_t: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-alpha closed-loop rollouts for a TRAJECTORY BATCH in one kernel.

    The batched-regime counterpart of ``fused_feedback_rollouts``: the whole
    rollout runs inside one Pallas ``fori_loop`` with the state carry
    VMEM-resident.

    MEASURED NEGATIVE RESULT (v5e, benchmarks/batched_phases_tpu.json): this
    kernel LOSES to the vmapped XLA scan at wide batches — 13.0 vs 4.2 ms at
    B=512 x H=50, 48.9 vs 9.3 ms at B=64 x H=1024. At those widths XLA
    amortizes its per-step loop overhead across one (B*A, n) tensor op per
    step, while this kernel's (A, tile_b) tiles leave sublanes idle and
    serialize batch tiles; the single-trajectory overhead-bound regime where
    ``fused_feedback_rollouts`` wins does not transfer. Kept available (and
    exact — equality tests in tests/test_fused_rollout.py) via
    ``ILQRConfig(linesearch="fused")`` under ``batched_ilqr_solve``; the
    dispatch default remains the XLA scan.

    Layout (mirrors the fused backward kernel): trajectory batch on the LANE
    axis (tile_b lanes per grid step), alphas on sublanes — the plant is
    traced in with a DOUBLE vmap so every per-component scalar intermediate
    becomes an (A, tile_b) VPU tile. Per-step refs stream HBM -> VMEM in
    ``block_t``-step horizon blocks through the Pallas pipeline; the horizon
    axis is the innermost (sequential) grid dimension.

    Returns ``(cand_x (A, B, H+1, n), cand_u (A, B, H, m))`` — identical
    contents to ``vmap(vmap(feedback_rollout))`` over (alpha, batch) up to
    f32 reassociation noise. Costs are evaluated OUTSIDE (see
    ``fused_feedback_rollouts``'s rationale).
    """
    batch, horizon, m = u_ref_seq.shape
    n = x0.shape[-1]
    n_alpha = alphas.shape[0]
    dtype = x0.dtype

    b_pad = _round_up(max(batch, tile_b), tile_b)
    h_pad = _round_up(horizon, block_t)

    def pad_b(x):
        if b_pad == batch:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((b_pad - batch,) + x.shape[1:], x.dtype)], axis=0
        )

    def pad_h(x):
        # APPEND junk steps (they run after every real step and their rows
        # are sliced off; zero dynamics inputs keep the padded plant evals
        # finite for the standard systems).
        if h_pad == horizon:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((x.shape[0], h_pad - horizon) + x.shape[2:], x.dtype)],
            axis=1,
        )

    x0_p = pad_b(x0)
    xref_p = pad_h(pad_b(x_ref_seq[:, :horizon]))
    uref_p = pad_h(pad_b(u_ref_seq))
    k_p = pad_h(pad_b(k_seq))
    bigk_p = pad_h(pad_b(big_k_seq))

    # SoA transposes (one XLA transpose per operand, bandwidth-bound):
    x0_t = x0_p.T  # (n, B)
    xref_t = jnp.transpose(xref_p, (1, 2, 0))  # (H, n, B)
    uref_t = jnp.transpose(uref_p, (1, 2, 0))  # (H, m, B)
    k_t = jnp.transpose(k_p, (1, 2, 0))  # (H, m, B)
    bigk_t = jnp.transpose(bigk_p, (1, 2, 3, 0))  # (H, m, n, B)
    alpha_col = alphas[:, None].astype(dtype)  # (A, 1)

    from quattro_tpu.ops.fused_solve import _hoist_array_constants

    dyn_conv, dyn_consts = _hoist_array_constants(
        dynamics,
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((m,), dtype),
    )
    const_shapes = [jnp.shape(c) for c in dyn_consts]
    # Natural shape for matrix consts; (1, -1) rows only for 0/1-D (see
    # ops/fused_solve.py — Mosaic rejects (1, r*c) -> (r, c) reshapes at
    # compile time).
    const_rows = [
        jnp.asarray(c) if np.ndim(c) >= 2 else jnp.reshape(jnp.asarray(c), (1, -1))
        for c in dyn_consts
    ]
    n_grid_h = h_pad // block_t
    n_grid_b = b_pad // tile_b

    def kernel(x0_r, xref_r, uref_r, k_r, bigk_r, alpha_r, *refs):
        from jax.experimental import pallas as pl

        const_refs = refs[: len(dyn_consts)]
        x_out, u_out = refs[len(dyn_consts) : len(dyn_consts) + 2]
        x_s = refs[-1]  # scratch (n, A, tile_b)
        const_vals = [
            r[...] if r.shape == shp else jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
        ]
        # Components-first double vmap: x (n, A, B) -> intermediates (A, B).
        step_fn = jax.vmap(
            jax.vmap(
                lambda x, u: dyn_conv(x, u, *const_vals),
                in_axes=(-1, -1),
                out_axes=-1,
            ),
            in_axes=(1, 1),
            out_axes=1,
        )

        @pl.when(pl.program_id(1) == 0)
        def _init():
            x_s[...] = jnp.broadcast_to(x0_r[...][:, None, :], (n, n_alpha, tile_b))

        alpha = alpha_r[...]  # (A, 1)

        def step(tt, _):
            x = x_s[...]  # (n, A, B)
            kk = k_r[tt]  # (m, B)
            bigk = bigk_r[tt]  # (m, n, B)
            xref = xref_r[tt]  # (n, B)
            uref = uref_r[tt]  # (m, B)
            dx = x - xref[:, None, :]  # (n, A, B)
            u_rows = []
            for j in range(m):
                du = kk[j] + sum(dx[i] * bigk[j, i] for i in range(n))  # (A, B)
                u_rows.append(uref[j] + alpha * du)
            u = jnp.stack(u_rows, axis=0)  # (m, A, B)
            x_next = step_fn(x, u)
            x_out[tt] = x_next
            u_out[tt] = u
            x_s[...] = x_next
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_grid_b, n_grid_h)

    def hspec(*dims):
        return pl.BlockSpec(
            (block_t,) + dims + (tile_b,),
            lambda ib, ih: (ih,) + (0,) * len(dims) + (ib,),
            memory_space=pltpu.VMEM,
        )

    x0_spec = pl.BlockSpec((n, tile_b), lambda ib, ih: (0, ib), memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec(
        (n_alpha, 1), lambda ib, ih: (0, 0), memory_space=pltpu.VMEM
    )
    x_soa, u_soa = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x0_spec,
            hspec(n),  # xref
            hspec(m),  # uref
            hspec(m),  # k
            hspec(m, n),  # big K
            alpha_spec,
        ]
        + [
            pl.BlockSpec(c.shape, lambda ib, ih: (0, 0), memory_space=pltpu.VMEM)
            for c in const_rows
        ],
        out_specs=[
            pl.BlockSpec(
                (block_t, n, n_alpha, tile_b),
                lambda ib, ih: (ih, 0, 0, ib),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_t, m, n_alpha, tile_b),
                lambda ib, ih: (ih, 0, 0, ib),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, n, n_alpha, b_pad), dtype),
            jax.ShapeDtypeStruct((h_pad, m, n_alpha, b_pad), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, n_alpha, tile_b), dtype)],
        interpret=interpret,
    )(x0_t, xref_t, uref_t, k_t, bigk_t, alpha_col, *const_rows)

    # SoA time-major (states AFTER each step) -> (A, B, H, .); prepend x0.
    x_steps = jnp.transpose(x_soa[:horizon], (2, 3, 0, 1))[:, :batch]  # (A, B, H, n)
    u_steps = jnp.transpose(u_soa[:horizon], (2, 3, 0, 1))[:, :batch]  # (A, B, H, m)
    x0_bc = jnp.broadcast_to(x0[None, :, None, :], (n_alpha, batch, 1, n))
    cand_x = jnp.concatenate([x0_bc, x_steps], axis=2)  # (A, B, H+1, n)
    return cand_x, u_steps
