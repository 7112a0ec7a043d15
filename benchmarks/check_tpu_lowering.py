"""Mosaic lowering smoke check for every fused Pallas entry point.

Run ON A TPU HOST. ``jax.jit(...).lower()`` builds the Mosaic module for
each fused kernel at its production shapes WITHOUT paying the multi-minute
Mosaic->binary compile, so this catches the failure class that interpret-mode
CI structurally cannot: kernels that pass ``interpret=True`` tests on CPU but
fail TPU lowering (shape-dependent ``tpu.dot_dimension_numbers`` rejections,
unsupported primitives, tile-alignment errors).

History: ``ilqr_solve_fused`` lowered fine at H<=16 but failed at H=100 —
the quadratic cost's ``dx @ Q @ dx`` became a dot_general with two batch
dims and zero non-contracting dims under the kernel's double-vmap, which
Mosaic rejects only at larger H (solver/costs.py carries the fix). CPU-side
``jax.export(platforms=['tpu'])`` does NOT reproduce that rejection, so the
check must run against the real backend.

Exit code 0 = all kernels lower; nonzero prints the failing kernel.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend is {jax.default_backend()!r}, need a TPU host")
        return 0

    from quattro_tpu.solver import (
        ILQRConfig,
        ilqr_solve_fused,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.solver.derivatives import (
        linearize_dynamics,
        quadratize_cost,
        quadratize_final_cost,
    )
    from quattro_tpu.solver.riccati import riccati_backward_fused
    from quattro_tpu.solver.rollout import line_search_fused, simulate, trajectory_cost
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    n, m = 12, 4
    x_ref = jnp.zeros(n).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((m,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]),
        x_ref,
    )
    x0 = jnp.zeros(n).at[2].set(0.2).at[6].set(0.1)

    failures = []

    def check(name, fn, *args):
        try:
            jax.jit(fn).lower(*args)
            print(f"{name}: lowers OK", flush=True)
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append(name)
            print(f"{name}: FAILED — {str(e).splitlines()[-1][:200]}", flush=True)

    for horizon in (100, 1024):
        u0 = jnp.zeros((horizon, m))
        x_seq = simulate(dyn, x0, u0)
        a_seq, b_seq = linearize_dynamics(dyn, x_seq, u0)
        exp = quadratize_cost(cost, x_seq, u0)
        fexp = quadratize_final_cost(fcost, x_seq[-1])
        check(
            f"riccati_backward_fused H{horizon}",
            lambda aa, bb, ee, _f=fexp: riccati_backward_fused(aa, bb, ee, _f.v_x, _f.v_xx).k_seq,
            a_seq, b_seq, exp,
        )
        if horizon == 100:
            c0 = trajectory_cost(cost, fcost, x_seq, u0)
            alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01])
            k0 = jnp.zeros((horizon, m))
            big_k0 = jnp.zeros((horizon, m, n))
            check(
                f"line_search_fused H{horizon}",
                lambda: line_search_fused(
                    dyn, cost, fcost, x0, x_seq, u0, k0, big_k0, c0, alphas
                )[4],
            )
            check(
                f"ilqr_solve_fused H{horizon}",
                lambda xi, _u=u0: ilqr_solve_fused(
                    dyn, cost, fcost, xi, _u, ILQRConfig(tol=0.0, max_iter=6)
                ).cost,
                x0,
            )

    # Batched fused backward at the pod-feed shape (64 x 1024).
    batch, horizon = 64, 1024
    a_b = jnp.broadcast_to(jnp.eye(n) * 0.99, (batch, horizon, n, n))
    b_b = jnp.broadcast_to(jnp.ones((n, m)) * 0.01, (batch, horizon, n, m))
    u0 = jnp.zeros((horizon, m))
    x_seq = simulate(dyn, x0, u0)
    exp = quadratize_cost(cost, x_seq, u0)
    exp_b = jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t, (batch,) + t.shape), exp
    )
    fexp = quadratize_final_cost(fcost, x_seq[-1])
    vx_b = jnp.broadcast_to(fexp.v_x, (batch, n))
    vxx_b = jnp.broadcast_to(fexp.v_xx, (batch, n, n))
    check(
        f"riccati_backward_batched_fused B{batch}xH{horizon}",
        lambda aa, bb: riccati_backward_batched_fused(aa, bb, exp_b, vx_b, vxx_b)[0],
        a_b, b_b,
    )
    check(
        f"riccati_backward_batched_fused B{batch}xH{horizon} bf16-stream",
        lambda aa, bb: riccati_backward_batched_fused(
            aa, bb, exp_b, vx_b, vxx_b, stream_dtype=jnp.bfloat16
        )[0],
        a_b, b_b,
    )

    # batch2d fused backward (batch on sublanes AND lanes, r5) at the wide
    # chunk shapes it dispatches for.
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused2d

    for batch2d, ts in ((512, 4), (1024, 8)):
        a2 = jnp.broadcast_to(jnp.eye(n) * 0.99, (batch2d, 64, n, n))
        b2 = jnp.broadcast_to(jnp.ones((n, m)) * 0.01, (batch2d, 64, n, m))
        exp2 = jax.tree_util.tree_map(
            lambda t: jnp.broadcast_to(t[None, :64], (batch2d, 64) + t.shape[1:]),
            exp,
        )
        vx2 = jnp.broadcast_to(fexp.v_x, (batch2d, n))
        vxx2 = jnp.broadcast_to(fexp.v_xx, (batch2d, n, n))
        check(
            f"riccati_backward_batched_fused2d B{batch2d} ts{ts}",
            lambda aa, bb, _e=exp2, _vx=vx2, _vxx=vxx2, _t=ts: riccati_backward_batched_fused2d(
                aa, bb, _e, _vx, _vxx, tile_s=_t, block_t=2
            )[0],
            a2, b2,
        )
        check(
            f"riccati_backward_batched_fused2d B{batch2d} ts{ts} bf16-stream",
            lambda aa, bb, _e=exp2, _vx=vx2, _vxx=vxx2, _t=ts: riccati_backward_batched_fused2d(
                aa, bb, _e, _vx, _vxx, tile_s=_t, block_t=4,
                stream_dtype=jnp.bfloat16,
            )[0],
            a2, b2,
        )

    # Batched fused line-search rollout at both batched-regime shapes.
    from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01])
    for batch, horizon in ((512, 50), (64, 1024)):
        x0_b = jnp.broadcast_to(x0, (batch, n))
        u0 = jnp.zeros((horizon, m))
        x_seq = simulate(dyn, x0, u0)
        xref_b = jnp.broadcast_to(x_seq, (batch,) + x_seq.shape)
        uref_b = jnp.zeros((batch, horizon, m))
        k_b = jnp.zeros((batch, horizon, m))
        bigk_b = jnp.zeros((batch, horizon, m, n))
        check(
            f"fused_feedback_rollouts_batched B{batch}xH{horizon}",
            lambda xb, ub, _xr=xref_b, _k=k_b, _bk=bigk_b: fused_feedback_rollouts_batched(
                dyn, xb, _xr, ub, _k, _bk, alphas
            )[0],
            x0_b, uref_b,
        )
        from quattro_tpu.ops.fused_rollout import fused_feedback_rollouts_batched2d

        check(
            f"fused_feedback_rollouts_batched2d B{batch}xH{horizon}",
            lambda xb, ub, _xr=xref_b, _k=k_b, _bk=bigk_b: fused_feedback_rollouts_batched2d(
                dyn, xb, _xr, ub, _k, _bk, alphas
            )[0],
            x0_b, uref_b,
        )

    # Fused linearize+quadratize kernel (r5) + the packed chain into the
    # batch2d backward — the cost's Hessian graph is traced IN-kernel here,
    # so this is where a select/bool-transpose in a cost derivative path
    # surfaces (history: the softplus barrier's max/abs autodiff rules emitted
    # a vector<...xi1> tpu.transpose until costs.py pinned analytic
    # custom_jvp derivatives).
    from quattro_tpu.ops.fused_linquad import linquad_batched_fused

    for batch, horizon in ((512, 50), (128, 1024)):
        x_b = jnp.broadcast_to(x0, (batch, horizon + 1, n))
        u_b = jnp.zeros((batch, horizon, m))
        check(
            f"linquad_batched_fused B{batch}xH{horizon}",
            lambda xb, ub: linquad_batched_fused(dyn, cost, xb, ub)[0],
            x_b, u_b,
        )
        vx_c = jnp.broadcast_to(fexp.v_x, (batch, n))
        vxx_c = jnp.broadcast_to(fexp.v_xx, (batch, n, n))
        check(
            f"linquad->backward2d packed chain B{batch}xH{horizon}",
            lambda xb, ub, _vx=vx_c, _vxx=vxx_c, _h=horizon: riccati_backward_batched_fused2d(
                None, None, None, _vx, _vxx,
                packed_stage=linquad_batched_fused(dyn, cost, xb, ub),
                horizon=_h,
            )[0],
            x_b, u_b,
        )

    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("ALL FUSED KERNELS LOWER FOR TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
