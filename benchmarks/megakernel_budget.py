"""Megakernel iteration-budget sweep: deterministic-latency frontier.

The MPC-layer megakernel (ops/fused_solve.py via ``solver="megakernel"``)
runs a FIXED ``max_iter`` budget of masked iterations — jitter-free step
latency for hard-real-time loops. Round 4 shipped it pinned at budget 6
(4.72 ms vs 3.05 ms for the fused-while solve) without ever sweeping the
budget, although per-iteration the megakernel is CHEAPER (~0.79 vs ~1.2 ms)
and the hardware parity record shows 3-6 iterations suffice across all 5
canonical poses (megakernel_parity_tpu.json).

This harness measures, for budgets 3..8 at the H=50 quadrotor hover config:

- parity: solve from the 5 canonical poses (megakernel at the budget vs the
  reference-semantics while solve at max_iter=12) — worst relative cost gap
  and how many poses stay inside the parity band (1e-3 relative, the
  megakernel_parity band);
- latency: per-control-step device time of the warm-started closed loop
  (50 chained steps in one jitted scan, single host fetch — see
  benchmarks/mpc_latency.py for why naive timing lies on this rig).

The smallest budget whose 5/5 poses hold the band is the deterministic-
latency pick; the table merges into benchmarks/mpc_latency_tpu.json under
``megakernel_budget_sweep``.

Usage: python benchmarks/megakernel_budget.py [--json benchmarks/mpc_latency_tpu.json]
       (each budget is a fresh ~4 min Mosaic compile when cold; cached after.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

COST_BAND = 1e-3
INITIAL_POSES = (
    (0.45, 0.05), (0.30, 0.10), (0.20, 0.15), (0.55, -0.12), (0.35, -0.20),
)


def measure_device_latency(ctrl, steps=50):
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    plant = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    x0 = jnp.zeros(12).at[2].set(0.2).at[6].set(0.1)

    def closed_loop(x_init):
        def body(carry, _):
            x, state = carry
            out = ctrl.step(x, state)
            u, state = out[0], out[-1]
            u0 = u[0] if u.ndim == 2 else u
            return (plant(x, u0), state), None

        (x_fin, _), _ = jax.lax.scan(
            body, (x_init, ctrl.init_state()), None, length=steps
        )
        return jnp.sum(x_fin)

    loop_j = jax.jit(closed_loop)
    float(loop_j(x0))  # compile + warm
    float(loop_j(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_j(x0))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--budgets", default="3,4,5,6,8")
    args = parser.parse_args()

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass

    from quattro_tpu.control import make_quadrotor_mpc
    from quattro_tpu.solver import (
        ILQRConfig,
        ilqr_solve,
        ilqr_solve_fused,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    x_ref = jnp.zeros(12).at[2].set(0.5)
    q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
    qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0)
    fcost = make_quadratic_final_cost(qf, x_ref)
    horizon = 50
    u0 = jnp.full((horizon, 4), 2.4525, dtype=jnp.float32)

    base_cfg = ILQRConfig(tol=1e-3, max_iter=12, riccati="seq")
    base = jax.jit(lambda x, u: ilqr_solve(dyn, cost, fcost, x, u, base_cfg))
    base_costs = []
    for z, roll in INITIAL_POSES:
        x0 = jnp.zeros(12, jnp.float32).at[2].set(z).at[6].set(roll)
        base_costs.append(float(base(x0, u0).cost))

    rows = []
    for budget in (int(b) for b in args.budgets.split(",")):
        cfg = ILQRConfig(tol=1e-3, max_iter=budget, riccati="seq")
        mega = jax.jit(lambda x, u, _c=cfg: ilqr_solve_fused(dyn, cost, fcost, x, u, _c))
        worst_rel = 0.0
        poses_ok = 0
        t0 = time.time()
        for (z, roll), cb in zip(INITIAL_POSES, base_costs):
            x0 = jnp.zeros(12, jnp.float32).at[2].set(z).at[6].set(roll)
            cm = float(mega(x0, u0).cost)
            rel = abs(cm - cb) / max(abs(cb), 1e-9)
            worst_rel = max(worst_rel, rel)
            poses_ok += int(rel < COST_BAND)
        ctrl = make_quadrotor_mpc(horizon=horizon, solver="megakernel", max_iter=budget)
        dev_ms = measure_device_latency(ctrl) * 1e3
        row = {
            "budget": budget,
            "device_ms_per_step": round(dev_ms, 3),
            "poses_in_band": poses_ok,
            "worst_rel_cost_gap": worst_rel,
            "parity": poses_ok == len(INITIAL_POSES),
        }
        rows.append(row)
        print(json.dumps(row), f"(elapsed {time.time() - t0:.0f}s)", flush=True)

    picks = [r for r in rows if r["parity"]]
    out = {
        "config": {"horizon": horizon, "tol": 1e-3, "cost_band_rel": COST_BAND,
                   "poses": list(INITIAL_POSES), "reference_max_iter": 12},
        "rows": rows,
        "smallest_parity_budget": picks[0]["budget"] if picks else None,
    }
    print(json.dumps(out, indent=2))
    if args.json:
        try:
            with open(args.json) as f:
                existing = json.load(f)
        except FileNotFoundError:
            existing = {}
        existing["megakernel_budget_sweep"] = out
        with open(args.json, "w") as f:
            json.dump(existing, f, indent=2)


if __name__ == "__main__":
    main()
