"""Where does a BATCHED iLQR iteration's time go? Per-phase timing.

The fused backward kernel (ops/fused_riccati.py) removed the Riccati
recursion's XLA scan overhead from the batched regime; this harness measures
what is left — per phase, at the two canonical batched shapes:

- sweep   (B=512, H=50):  data-collection / batch-throughput shape
- pod_feed (B=64, H=1024): BASELINE config-5 per-chip chunk

Phases (one batched iLQR iteration = all four):
  linearize   vmapped jacfwd A/B             (solver/derivatives.py)
  quadratize  vmapped cost expansion         (solver/derivatives.py)
  backward    fused Pallas kernel            (ops/fused_riccati.py)
  linesearch        vmapped all-alpha scan rollout + cost + first-accept
  linesearch_fused  the batched all-alpha rollout Pallas kernel
                    (ops/fused_rollout.py) + XLA cost/select

Timing via _time_pipelined (dependency-chained repeats inside one jitted
fori_loop — see benchmarks/suite.py for why naive timing lies on this rig).

Usage: python benchmarks/batched_phases.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks.suite import _time_pipelined  # noqa: E402


def build(system_batch, horizon):
    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    x_ref = jnp.zeros(12).at[2].set(0.5)
    q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
    qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0)
    fcost = make_quadratic_final_cost(qf, x_ref)
    return dyn, cost, fcost


def bench_shape(batch, horizon, repeats=8, unroll_sweep=True):
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused
    from quattro_tpu.solver.derivatives import (
        linearize_dynamics,
        quadratize_cost,
        quadratize_final_cost,
    )
    from quattro_tpu.solver.rollout import line_search, simulate

    n, m = 12, 4
    dyn, cost, fcost = build(batch, horizon)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (batch, n), dtype=jnp.float32) * 0.1
    x0 = x0.at[:, 2].add(0.3)
    us = jnp.full((batch, horizon, m), 2.4525, dtype=jnp.float32)
    xs = jax.jit(jax.vmap(lambda x, u: simulate(dyn, x, u)))(x0, us)

    lin = jax.jit(jax.vmap(lambda x, u: linearize_dynamics(dyn, x, u)))
    quad = jax.jit(jax.vmap(lambda x, u: quadratize_cost(cost, x, u)))
    fquad = jax.jit(jax.vmap(lambda x: quadratize_final_cost(fcost, x)))

    a, b = lin(xs, us)
    exp = quad(xs, us)
    fexp = fquad(xs[:, -1])

    back = jax.jit(
        lambda aa, bb, ee, vx, vxx: riccati_backward_batched_fused(aa, bb, ee, vx, vxx)[0]
    )
    k, big_k = jax.jit(
        lambda aa, bb, ee, vx, vxx: riccati_backward_batched_fused(aa, bb, ee, vx, vxx)
    )(a, b, exp, fexp.v_x, fexp.v_xx)
    cost0 = jax.jit(
        jax.vmap(lambda x, u: jnp.sum(jax.vmap(cost)(x[:-1], u)) + fcost(x[-1]))
    )(xs, us)
    alphas = jnp.asarray((1.0, 0.5, 0.25, 0.1, 0.05, 0.01), dtype=jnp.float32)

    ls = jax.jit(
        jax.vmap(
            lambda x0_, x_, u_, k_, kb_, c_: line_search(
                dyn, cost, fcost, x0_, x_, u_, k_, kb_, c_, alphas
            )[4]
        )
    )

    from quattro_tpu.solver.rollout import line_search_batched_fused

    ls_fused = jax.jit(
        lambda x0_, x_, u_, k_, kb_, c_: line_search_batched_fused(
            dyn, cost, fcost, x0_, x_, u_, k_, kb_, c_, alphas
        )[4]
    )

    out = {}
    out["linearize"] = _time_pipelined(lambda x, u: lin(x, u)[0], (xs, us), repeats=repeats)
    out["quadratize"] = _time_pipelined(lambda x, u: quad(x, u).l_x, (xs, us), repeats=repeats)
    out["backward_fused"] = _time_pipelined(
        lambda aa, bb: back(aa, bb, exp, fexp.v_x, fexp.v_xx), (a, b), repeats=repeats
    )
    out["linesearch"] = _time_pipelined(
        lambda x, u: ls(x0, x, u, k, big_k, cost0), (xs, us), repeats=repeats
    )
    # Unroll sweep: the phase is per-trip overhead-bound (tiny (B*A, n) rows
    # per scan step), so unrolling the rollout scan amortizes it with
    # identical numerics (ILQRConfig.linesearch_unroll).
    if unroll_sweep:
        for unroll in (4, 8, 16, 32):
            ls_u = jax.jit(
                jax.vmap(
                    lambda x0_, x_, u_, k_, kb_, c_, _u=unroll: line_search(
                        dyn, cost, fcost, x0_, x_, u_, k_, kb_, c_, alphas, unroll=_u
                    )[4]
                )
            )
            out[f"linesearch_unroll{unroll}"] = _time_pipelined(
                lambda x, u, _f=ls_u: _f(x0, x, u, k, big_k, cost0), (xs, us),
                repeats=repeats,
            )
        out["linesearch_fused"] = _time_pipelined(
            lambda x, u: ls_fused(x0, x, u, k, big_k, cost0), (xs, us), repeats=repeats
        )

    # --- r5: the two line-search designs the r4 verdict left untried ---
    # (a) running cost fused INTO the rollout scan (halves HBM re-reads)
    for unroll in (1, 8):
        ls_fc = jax.jit(
            jax.vmap(
                lambda x0_, x_, u_, k_, kb_, c_, _u=unroll: line_search(
                    dyn, cost, fcost, x0_, x_, u_, k_, kb_, c_, alphas,
                    unroll=_u, fuse_cost=True,
                )[4]
            )
        )
        key_ = "linesearch_fusecost" if unroll == 1 else f"linesearch_fusecost_unroll{unroll}"
        out[key_] = _time_pipelined(
            lambda x, u, _f=ls_fc: _f(x0, x, u, k, big_k, cost0), (xs, us),
            repeats=repeats,
        )
    # (b) the transposed batch2d rollout kernel (alphas folded into the
    # sublane*lane pair axis — the r3-verdict proposed layout)
    from quattro_tpu.solver.rollout import line_search_batched2d

    ls_2d = jax.jit(
        lambda x0_, x_, u_, k_, kb_, c_: line_search_batched2d(
            dyn, cost, fcost, x0_, x_, u_, k_, kb_, c_, alphas
        )[4]
    )
    out["linesearch_batched2d"] = _time_pipelined(
        lambda x, u: ls_2d(x0, x, u, k, big_k, cost0), (xs, us), repeats=repeats
    )

    # --- r5: fused linearize+quadratize kernel + packed backward chain ---
    # Alignment contract: batch % (tile_s*128) == 0. Pad the batch by row
    # replication when needed (recorded in packed_pad_batch — the padded rows
    # do real extra work; the row is honest about its feed).
    from quattro_tpu.ops.fused_linquad import linquad_batched_fused
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused2d

    tile_s = max(1, min(8, -(-batch // 128)))
    chunk = tile_s * 128
    b_pad = ((batch + chunk - 1) // chunk) * chunk
    if b_pad != batch:
        reps = -(-b_pad // batch)
        xs_p = jnp.concatenate([xs] * reps, axis=0)[:b_pad]
        us_p = jnp.concatenate([us] * reps, axis=0)[:b_pad]
    else:
        xs_p, us_p = xs, us
    out["packed_pad_batch"] = b_pad
    fexp_p = fquad(xs_p[:, -1])

    try:
        lq = jax.jit(lambda x, u: linquad_batched_fused(dyn, cost, x, u)[0])
        out["linquad_fused"] = _time_pipelined(lq, (xs_p, us_p), repeats=repeats)

        pk = jax.jit(lambda x, u: linquad_batched_fused(dyn, cost, x, u))(xs_p, us_p)
        back2d = jax.jit(
            lambda a0: riccati_backward_batched_fused2d(
                None, None, None, fexp_p.v_x, fexp_p.v_xx,
                packed_stage=(a0,) + tuple(pk[1:]), horizon=horizon,
            )[0]
        )
        out["backward_fused2d_packed"] = _time_pipelined(back2d, (pk[0],), repeats=repeats)

        chain = jax.jit(
            lambda x, u: riccati_backward_batched_fused2d(
                None, None, None, fexp_p.v_x, fexp_p.v_xx,
                packed_stage=linquad_batched_fused(dyn, cost, x, u),
                horizon=horizon,
            )[0]
        )
        out["chain_linquad_backward2d"] = _time_pipelined(
            chain, (xs_p, us_p), repeats=repeats
        )
    except Exception as exc:  # Mosaic lowering boundaries stay recorded, not fatal
        out["packed_error"] = f"{type(exc).__name__}: {exc}"[:400]

    out["iteration_total_xla_ls"] = (
        out["linearize"] + out["quadratize"] + out["backward_fused"] + out["linesearch"]
    )
    if unroll_sweep:
        out["iteration_total_fused_ls"] = (
            out["linearize"] + out["quadratize"] + out["backward_fused"]
            + out["linesearch_fused"]
        )
    best_ls = min(
        out["linesearch"], out["linesearch_fusecost"],
        out["linesearch_fusecost_unroll8"], out["linesearch_batched2d"],
    )
    if b_pad == batch and "chain_linquad_backward2d" in out:
        out["iteration_total_packed"] = out["chain_linquad_backward2d"] + best_ls
    out["shape"] = {"batch": batch, "horizon": horizon, "n": n, "m": m}
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--resweep-unroll", action="store_true")
    args = parser.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )

    out = {"backend": jax.default_backend()}
    # The unroll sweep (and the superseded alphas-on-sublanes linesearch_fused
    # row) is stable round-to-round; skip re-measuring it and carry the
    # committed rows forward (--resweep-unroll re-measures).
    out["sweep_B512_H50"] = bench_shape(512, 50, unroll_sweep=args.resweep_unroll)
    print(json.dumps({"sweep_B512_H50": out["sweep_B512_H50"]}, indent=2), flush=True)
    out["pod_feed_B64_H1024"] = bench_shape(64, 1024, unroll_sweep=args.resweep_unroll)
    print(json.dumps({"pod_feed_B64_H1024": out["pod_feed_B64_H1024"]}, indent=2), flush=True)
    # Alignment-clean pod-feed variant: B=128 satisfies the packed-path
    # contract with no padding, so iteration_total_packed is apples-to-apples.
    out["pod_feed_B128_H1024"] = bench_shape(128, 1024, unroll_sweep=False)
    print(json.dumps({"pod_feed_B128_H1024": out["pod_feed_B128_H1024"]}, indent=2), flush=True)

    prior_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "batched_phases_tpu.json")
    if os.path.exists(prior_path):
        with open(prior_path) as f:
            prior = json.load(f)
        for shape_key, shape_out in out.items():
            if isinstance(shape_out, dict) and shape_key in prior:
                for k, v in prior[shape_key].items():
                    shape_out.setdefault(k, v)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
