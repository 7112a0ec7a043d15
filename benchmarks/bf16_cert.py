"""Certify riccati_backend='fused_bf16' at its deployment granularity.

The bf16 input-streaming backend is validated at kernel and one-solve
level (tests/test_fused_riccati.py, ~1e-3 relative band on gains). The r4
verdict's open question: does that band FLIP decisions — line-search
accepts, convergence flags, iteration counts — at collection scale or in a
closed loop, the f32-near-tolerance effect class the megakernel parity run
surfaced in r3? This harness answers it with two measurements against the
exact f32 fused backend on identical problems:

A. Collection-scale solve sweep (B=512 quadrotor hover solves, H=50,
   tol=1e-3, max_iter=12): per-lane converged flags, iteration counts,
   final costs.
B. Batched closed-loop lockstep MPC (B=64 lanes x 100 warm-started steps,
   solver model as plant — the shape of the on-device collection driver):
   per-lane final hover error and the cross-backend trajectory gap.

Decision rule (recorded in BASELINE.md): promote to collection default iff
(a) no lane's closed-loop outcome changes (hover vs not), and (b) solve-
sweep convergence flips stay <= 2% of lanes with cost agreement inside
1e-3 relative on agreeing lanes. Otherwise fused_bf16 stays opt-in with
the measured boundary pinned.

Usage: python benchmarks/bf16_cert.py [--json benchmarks/bf16_cert_tpu.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    x_ref = jnp.zeros(12).at[2].set(0.5)
    q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
    qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0)
    fcost = make_quadratic_final_cost(qf, x_ref)
    return dyn, cost, fcost, x_ref


def solve_sweep(backend, batch=512, horizon=50):
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig

    dyn, cost, fcost, _ = build()
    key = jax.random.PRNGKey(7)
    x0 = 0.15 * jax.random.normal(key, (batch, 12), jnp.float32)
    x0 = x0.at[:, 2].add(0.3)
    u0 = jnp.full((batch, horizon, 4), 2.4525, jnp.float32)
    cfg = ILQRConfig(tol=1e-3, max_iter=12)
    sol = jax.jit(
        lambda x, u: batched_ilqr_solve(
            dyn, cost, fcost, x, u, cfg, riccati_backend=backend
        )
    )(x0, u0)
    return (np.asarray(sol.converged), np.asarray(sol.iterations),
            np.asarray(sol.cost))


def closed_loop(backend, batch=64, steps=100, horizon=50):
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig

    dyn, cost, fcost, x_ref = build()
    key = jax.random.PRNGKey(11)
    x0 = 0.12 * jax.random.normal(key, (batch, 12), jnp.float32)
    x0 = x0.at[:, 2].add(0.25)
    cfg = ILQRConfig(tol=1e-3, max_iter=6)
    u_init = jnp.full((batch, horizon, 4), 2.4525, jnp.float32)

    def loop(x_init):
        def body(carry, _):
            x, u_warm = carry
            sol = batched_ilqr_solve(
                dyn, cost, fcost, x, u_warm, cfg, riccati_backend=backend
            )
            u0 = sol.u_seq[:, 0]
            x_next = jax.vmap(dyn)(x, u0)
            # receding-horizon warm-start shift
            u_shift = jnp.concatenate(
                [sol.u_seq[:, 1:], sol.u_seq[:, -1:]], axis=1
            )
            return (x_next, u_shift), x_next

        (_, _), traj = jax.lax.scan(body, (x_init, u_init), None, length=steps)
        return traj  # (steps, B, 12)

    traj = jax.jit(loop)(x0)
    traj = np.asarray(traj)
    final_err = np.max(np.abs(traj[-1] - np.asarray(x_ref)[None, :]), axis=-1)
    return traj, final_err


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    args = parser.parse_args()
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass

    out = {"backend": jax.default_backend()}

    # A: collection-scale solves
    conv_f, it_f, c_f = solve_sweep("fused")
    conv_b, it_b, c_b = solve_sweep("fused_bf16")
    agree = conv_f == conv_b
    rel = np.abs(c_b - c_f) / np.maximum(np.abs(c_f), 1e-9)
    out["solve_sweep_B512"] = {
        "lanes": int(conv_f.size),
        "converged_f32": int(conv_f.sum()),
        "converged_bf16": int(conv_b.sum()),
        "flag_flips": int((~agree).sum()),
        "flag_flip_fraction": float((~agree).mean()),
        "max_abs_iter_diff": int(np.max(np.abs(it_b.astype(int) - it_f.astype(int)))),
        "mean_abs_iter_diff": float(np.mean(np.abs(it_b.astype(int) - it_f.astype(int)))),
        "rel_cost_diff_max_on_agreeing": float(rel[agree].max()),
        "rel_cost_diff_median": float(np.median(rel)),
    }
    print(json.dumps({"solve_sweep_B512": out["solve_sweep_B512"]}), flush=True)

    # B: closed-loop lockstep MPC
    traj_f, err_f = closed_loop("fused")
    traj_b, err_b = closed_loop("fused_bf16")
    hover_bar = 0.05
    hover_f = err_f < hover_bar
    hover_b = err_b < hover_bar
    out["closed_loop_B64x100"] = {
        "lanes": int(err_f.size),
        "hover_bar": hover_bar,
        "hover_f32": int(hover_f.sum()),
        "hover_bf16": int(hover_b.sum()),
        "outcome_flips": int((hover_f != hover_b).sum()),
        "max_final_err_f32": float(err_f.max()),
        "max_final_err_bf16": float(err_b.max()),
        "max_traj_gap": float(np.max(np.abs(traj_b - traj_f))),
        "median_traj_gap": float(np.median(np.abs(traj_b - traj_f))),
    }
    print(json.dumps({"closed_loop_B64x100": out["closed_loop_B64x100"]}), flush=True)

    a = out["solve_sweep_B512"]
    b = out["closed_loop_B64x100"]
    out["promote_to_default"] = bool(
        b["outcome_flips"] == 0
        and a["flag_flip_fraction"] <= 0.02
        and a["rel_cost_diff_max_on_agreeing"] < 1e-3
    )
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
