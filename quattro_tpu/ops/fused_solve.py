"""Whole-solve fused iLQR — every iteration phase inside ONE Pallas kernel.

The fused backward pass (ops/fused_riccati.py) and fused line-search rollout
(ops/fused_rollout.py) each remove the XLA per-step loop overhead from one
sequential stage, but a solve still alternates kernels with XLA phases
(linearize/quadratize, select, while-loop bookkeeping), each a fusion
boundary with HBM round-trips for every intermediate. At MPC scale the
entire problem is a few hundred KB — this kernel keeps ALL of it in VMEM
for the whole solve:

    for iteration in range(max_iter):              # fori_loop, masked done
        linearize + quadratize   (double-vmapped jacfwd/grad/hessian of the
                                  user's dynamics & cost, traced into the
                                  kernel; intermediates are (1, H, ...) so
                                  every per-component scalar is a 2-D tile)
        backward Riccati         (fori over H; riccati_step_tiles)
        line-search rollouts     (all alphas at once, fori over H)
        first-accept select + convergence bookkeeping (reference semantics)

Convergence follows ``ilqr_solve`` exactly (quattro_ilqr_tf.py:440-472
semantics): fixed ``max_iter`` trips with a ``done`` mask — iterations after
convergence recompute on the frozen trajectory and are discarded, which is
how ``ilqr_solve_with_logs`` already realizes while-loop-equivalent results
under ``lax.scan``. The adaptive LM mu-schedule is NOT supported here
(``reg`` is a static kernel literal).

User callables (dynamics, running cost, final cost) must be jnp-expressible
AND lower through Mosaic (sin/cos/tan/exp/log/dots all do); anything else
stays on the ``ilqr_solve`` path. ``interpret=True`` runs the kernel in
interpret mode for CPU tests.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quattro_tpu.ops.fused_riccati import make_tile_dot, riccati_step_tiles

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
RunningCost = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
FinalCost = Callable[[jnp.ndarray], jnp.ndarray]


def _hoist_array_constants(fn, *example_args):
    """Trace ``fn`` (single-array-output) and promote its closed-over array
    constants (jaxpr constvars) to explicit trailing arguments.

    ``jax.closure_convert`` leaves concrete closed-over arrays embedded as
    jaxpr constants; Pallas kernel bodies may not capture those, so this is
    the general escape: returns ``(conv, consts)`` with
    ``conv(*args, *consts) == fn(*args)`` and ``conv`` free of array
    constants (scalar literals stay inline).
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    n_args = len(example_args)

    def conv(*args_and_consts):
        args = args_and_consts[:n_args]
        consts = args_and_consts[n_args:]
        out = jax.core.eval_jaxpr(closed.jaxpr, consts, *args)
        return out[0]

    return conv, list(closed.consts)


def fused_ilqr_solve_kernel(
    dynamics: Dynamics,
    cost: RunningCost,
    final_cost: FinalCost,
    x_init_seq: jnp.ndarray,  # (H+1, n) initial rollout of u_init
    u_init: jnp.ndarray,  # (H, m)
    cost_init: jnp.ndarray,  # scalar
    max_iter: int,
    tol: float,
    reg: float,
    alphas: Tuple[float, ...],
    interpret: bool = False,
    lin_block: int | None = None,
):
    """Run the full masked-iteration solve in one kernel.

    ``lin_block``: horizon block size for the linearize/quadratize phase.
    Tracing the double-vmapped jacfwd/hessian over the WHOLE horizon keeps
    ~(1, H, n_tangent, ...) intermediates live at once; Mosaic pads each
    trailing (n, n) to full (sublane, lane) vector tiles, so at H=50 the
    scoped-VMEM stack reaches 18.2 MB vs the 16 MB limit (measured on v5e).
    Blocking the phase over the horizon bounds the live set to one block's
    intermediates. Defaults to the largest divisor of ``horizon`` that is
    <= 16; pass ``horizon`` to recover the unblocked single-shot trace.

    Returns (x_seq (H+1, n), u_seq (H, m), k_seq (H, m),
    big_k_seq (H, m, n), stats (1, 3) = [cost, iterations, converged]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    horizon, m = u_init.shape
    if lin_block is None:
        lin_block = max(d for d in range(1, min(horizon, 16) + 1)
                        if horizon % d == 0)
    if horizon % lin_block != 0:
        raise ValueError(f"lin_block {lin_block} must divide horizon {horizon}")
    n = x_init_seq.shape[-1]
    dtype = x_init_seq.dtype
    n_alpha = len(alphas)
    reg_c = float(reg)
    tol_c = float(tol)

    # Pallas rejects non-scalar constants captured by the kernel body, and
    # user callables routinely close over arrays (cost matrices, x_ref).
    # Hoist them by tracing each callable to a jaxpr and promoting its
    # constvars to arguments (jax.closure_convert only hoists *tracer*
    # constants, not concrete closed-over arrays); they enter the kernel as
    # ordinary VMEM inputs (natural shape if >= 2-D, else (1, size) rows)
    # and are re-materialized inside.
    x_ex = jax.ShapeDtypeStruct((n,), dtype)
    u_ex = jax.ShapeDtypeStruct((m,), dtype)
    dyn_conv, dyn_consts = _hoist_array_constants(dynamics, x_ex, u_ex)
    cost_conv, cost_consts = _hoist_array_constants(cost, x_ex, u_ex)
    fcost_conv, fcost_consts = _hoist_array_constants(final_cost, x_ex)
    all_consts = [*dyn_consts, *cost_consts, *fcost_consts]
    const_shapes = [jnp.shape(c) for c in all_consts]
    # Matrix-shaped consts (ndim >= 2, e.g. a closed-over diag(Q)) enter the
    # kernel in their NATURAL shape: re-materializing them from a flat row
    # needs a (1, r*c) -> (r, c) tpu.reshape that Mosaic's layout inference
    # rejects at compile time (measured on v5e; the lowering check alone
    # does not catch it). Only 0/1-D consts get the (1, -1) row treatment
    # Mosaic's >= 2-D input rule requires.
    const_rows = [
        jnp.asarray(c) if np.ndim(c) >= 2 else jnp.reshape(jnp.asarray(c), (1, -1))
        for c in all_consts
    ]
    n_dyn, n_cost = len(dyn_consts), len(cost_consts)

    def kernel_body_fns(const_vals):
        """Bind the hoisted constants back into per-point callables and
        build the double-vmapped derivative forms (trace-time transforms:
        the kernel jaxpr contains only primitive ops by the time Mosaic
        sees it). Leading (1, H) / (1, A) vmap axes keep every
        per-component scalar intermediate >= 2-D."""
        dc = const_vals[:n_dyn]
        cc = const_vals[n_dyn : n_dyn + n_cost]
        fc = const_vals[n_dyn + n_cost :]
        dynamics_k = lambda x, u: dyn_conv(x, u, *dc)
        cost_k = lambda x, u: cost_conv(x, u, *cc)
        final_k = lambda x: fcost_conv(x, *fc)

        jac_dyn = jax.jacfwd(dynamics_k, argnums=(0, 1))
        grad_x = jax.grad(cost_k, argnums=0)
        grad_u = jax.grad(cost_k, argnums=1)
        hess_xx = jax.jacfwd(grad_x, argnums=0)
        hess_uu = jax.jacfwd(grad_u, argnums=1)
        hess_ux = jax.jacfwd(grad_u, argnums=0)

        def expand_point(x, u):
            return (
                grad_x(x, u), grad_u(x, u),
                hess_xx(x, u), hess_uu(x, u), hess_ux(x, u),
            )

        return (
            jax.vmap(jax.vmap(jac_dyn)),  # lin2
            jax.vmap(jax.vmap(expand_point)),  # expand2
            jax.vmap(jax.vmap(jax.grad(final_k))),  # fgrad2
            jax.vmap(jax.vmap(jax.hessian(final_k))),  # fhess2
            jax.vmap(jax.vmap(dynamics_k)),  # dyn2
            jax.vmap(jax.vmap(cost_k)),  # cost2
            jax.vmap(jax.vmap(final_k)),  # fcost2
        )

    def kernel(x0seq_r, u0_r, c0_r, *refs):
        const_refs = refs[: len(all_consts)]
        refs = refs[len(all_consts) :]
        const_vals = [
            r[...] if r.shape == shp else jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
        ]
        lin2, expand2, fgrad2, fhess2, dyn2, cost2, fcost2 = kernel_body_fns(
            const_vals
        )
        _kernel(x0seq_r, u0_r, c0_r, lin2, expand2, fgrad2, fhess2, dyn2,
                cost2, fcost2, *refs)

    def _kernel(x0seq_r, u0_r, c0_r,
                lin2, expand2, fgrad2, fhess2, dyn2, cost2, fcost2,
               x_out, u_out, k_out, bigk_out, stats_out,
               xs_s, us_s, at_s, bt_s, a_s, b_s,
               lx_s, lu_s, lxx_s, luu_s, lux_s, luxt_s,
               kt_s, ktT_s, cx_s, cu_s):
        dot = make_tile_dot(dtype)

        # Current trajectory lives in scratch (rows are (1, .) tiles so the
        # per-step loops read 2-D values).
        xs_s[...] = x0seq_r[...]  # (H+1, 1, n)
        us_s[...] = u0_r[...]  # (H, 1, m)
        k_out[...] = jnp.zeros((horizon, m), dtype)
        bigk_out[...] = jnp.zeros((horizon, m, n), dtype)

        def iteration(_, carry):
            cur_cost, done, iters = carry  # (1, 1) each
            active = done[0, 0] < 0.5

            # ---- linearize + quadratize (blocked over the horizon) ------
            # One block of (1, lin_block) points per trip: bounds the live
            # jacfwd/hessian intermediates to a block instead of the whole
            # horizon (see the lin_block note in the docstring).
            def linstep(bi, _):
                s = bi * lin_block
                xh = jnp.swapaxes(xs_s[pl.ds(s, lin_block)], 0, 1)  # (1, blk, n)
                uh = jnp.swapaxes(us_s[pl.ds(s, lin_block)], 0, 1)  # (1, blk, m)
                a2, b2 = lin2(xh, uh)  # (1, blk, n, n), (1, blk, n, m)
                lx2, lu2, lxx2, luu2, lux2 = expand2(xh, uh)
                a_s[pl.ds(s, lin_block)] = a2[0]
                at_s[pl.ds(s, lin_block)] = jnp.swapaxes(a2[0], -1, -2)
                b_s[pl.ds(s, lin_block)] = b2[0]
                bt_s[pl.ds(s, lin_block)] = jnp.swapaxes(b2[0], -1, -2)
                lx_s[pl.ds(s, lin_block)] = lx2[0][:, None, :]
                lu_s[pl.ds(s, lin_block)] = lu2[0][:, None, :]
                lxx_s[pl.ds(s, lin_block)] = lxx2[0]
                luu_s[pl.ds(s, lin_block)] = luu2[0]
                lux_s[pl.ds(s, lin_block)] = lux2[0]
                luxt_s[pl.ds(s, lin_block)] = jnp.swapaxes(lux2[0], -1, -2)
                return 0

            jax.lax.fori_loop(0, horizon // lin_block, linstep, 0)

            xs_all = xs_s[...]  # (H+1, 1, n)
            xf = xs_all[horizon][None]  # (1, 1, n)
            vx0 = fgrad2(xf)[0]  # (1, n)
            vxx0 = fhess2(xf)[0, 0]  # (n, n)

            # ---- backward Riccati (fori over H) -------------------------
            def bstep(i, vcarry):
                vx, vxx = vcarry
                t = horizon - 1 - i
                g_u, g_x, vx_new, vxx_new = riccati_step_tiles(
                    a_s[t], at_s[t], b_s[t], bt_s[t],
                    lx_s[t], lu_s[t], lxx_s[t], luu_s[t], lux_s[t], luxt_s[t],
                    vx, vxx, reg_c, dot,
                )
                kt_s[t] = -jnp.swapaxes(g_u, 0, 1)  # (1, m)
                ktT_s[t] = -jnp.swapaxes(g_x, 0, 1)  # (n, m) = K^T
                return (vx_new, vxx_new)

            jax.lax.fori_loop(0, horizon, bstep, (vx0, vxx0))

            # ---- all-alpha line-search rollout (fori over H) ------------
            # Built from scalar splats (a materialized constant array would
            # be a captured constant, which pallas_call rejects).
            alpha_col = jnp.concatenate(
                [jnp.full((1, 1), float(a), dtype) for a in alphas], axis=0
            )  # (A, 1)
            x_ls = jnp.broadcast_to(xs_all[0], (n_alpha, n))
            cx_s[0] = x_ls

            def lstep(t, carry_ls):
                x_cand, run_cost = carry_ls  # (A, n), (1, A)
                du = kt_s[t] + dot(x_cand - xs_s[t], ktT_s[t])  # (A, m)
                u_cand = us_s[t] + alpha_col * du
                run_cost = run_cost + cost2(x_cand[None], u_cand[None])
                x_next = dyn2(x_cand[None], u_cand[None])[0]
                cu_s[t] = u_cand
                cx_s[t + 1] = x_next
                return (x_next, run_cost)

            x_last, run_cost = jax.lax.fori_loop(
                0, horizon, lstep, (x_ls, jnp.zeros((1, n_alpha), dtype))
            )
            total = run_cost + fcost2(x_last[None])  # (1, A)

            # ---- first-accept select (static unroll over alphas) --------
            cur = cur_cost[0, 0]
            accepted = [total[0, i] <= cur for i in range(n_alpha)]
            found = accepted[0]
            for acc in accepted[1:]:
                found = jnp.logical_or(found, acc)
            # First-accept one-hot: accepted[i] and none accepted before it
            # (alphas are ordered descending, reference accept order).
            prior = jnp.zeros((), jnp.bool_)
            onehot = []
            for i in range(n_alpha):
                onehot.append(jnp.logical_and(accepted[i], jnp.logical_not(prior)))
                prior = jnp.logical_or(prior, accepted[i])

            upd = jnp.logical_and(active, found)
            cand_x = cx_s[...]  # (H+1, A, n)
            cand_u = cu_s[...]  # (H, A, m)
            new_x = jnp.zeros((horizon + 1, 1, n), dtype)
            new_u = jnp.zeros((horizon, 1, m), dtype)
            new_cost = jnp.zeros((), dtype)
            for i in range(n_alpha):
                w = onehot[i].astype(dtype)
                new_x = new_x + w * cand_x[:, i : i + 1, :]
                new_u = new_u + w * cand_u[:, i : i + 1, :]
                new_cost = new_cost + w * total[0, i]

            xs_s[...] = jnp.where(upd, new_x, xs_s[...])
            us_s[...] = jnp.where(upd, new_u, us_s[...])
            # Gains of the last ACTIVE iteration (reference: optimize
            # returns the final backward pass's gains even when rejected).
            act_f = active.astype(dtype)
            k_out[...] = act_f * kt_s[...][:, 0, :] + (1 - act_f) * k_out[...]
            bigk_out[...] = (
                act_f * jnp.swapaxes(ktT_s[...], -1, -2) + (1 - act_f) * bigk_out[...]
            )

            cost_next = jnp.where(upd, new_cost, cur)
            small = jnp.abs(cur - cost_next) < tol_c
            done_step = jnp.logical_or(jnp.logical_not(found), small)
            done_next = jnp.where(active, done_step.astype(dtype), done[0, 0])
            return (
                cost_next[None, None].astype(dtype),
                done_next[None, None].astype(dtype),
                iters + act_f,
            )

        zero = jnp.zeros((1, 1), dtype)
        cur_cost, done, iters = jax.lax.fori_loop(
            0, max_iter, iteration, (c0_r[...], zero, zero)
        )

        x_out[...] = xs_s[...][:, 0, :]
        u_out[...] = us_s[...][:, 0, :]
        stats_out[...] = jnp.concatenate([cur_cost, iters, done], axis=1)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((horizon + 1, 1, n), dtype),  # xs_s
        pltpu.VMEM((horizon, 1, m), dtype),  # us_s
        pltpu.VMEM((horizon, n, n), dtype),  # at_s
        pltpu.VMEM((horizon, m, n), dtype),  # bt_s
        pltpu.VMEM((horizon, n, n), dtype),  # a_s
        pltpu.VMEM((horizon, n, m), dtype),  # b_s
        pltpu.VMEM((horizon, 1, n), dtype),  # lx_s
        pltpu.VMEM((horizon, 1, m), dtype),  # lu_s
        pltpu.VMEM((horizon, n, n), dtype),  # lxx_s
        pltpu.VMEM((horizon, m, m), dtype),  # luu_s
        pltpu.VMEM((horizon, m, n), dtype),  # lux_s
        pltpu.VMEM((horizon, n, m), dtype),  # luxt_s
        pltpu.VMEM((horizon, 1, m), dtype),  # kt_s
        pltpu.VMEM((horizon, n, m), dtype),  # ktT_s
        pltpu.VMEM((horizon + 1, n_alpha, n), dtype),  # cx_s
        pltpu.VMEM((horizon, n_alpha, m), dtype),  # cu_s
    ]
    x_seq, u_seq, k_seq, big_k_seq, stats = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((horizon + 1, n), dtype),
            jax.ShapeDtypeStruct((horizon, m), dtype),
            jax.ShapeDtypeStruct((horizon, m), dtype),
            jax.ShapeDtypeStruct((horizon, m, n), dtype),
            jax.ShapeDtypeStruct((1, 3), dtype),
        ],
        in_specs=[vmem() for _ in range(3 + len(all_consts))],
        out_specs=[vmem() for _ in range(5)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        x_init_seq[:, None, :],
        u_init[:, None, :],
        jnp.reshape(cost_init.astype(dtype), (1, 1)),
        *const_rows,
    )
    return x_seq, u_seq, k_seq, big_k_seq, stats
