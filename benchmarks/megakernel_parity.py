"""On-hardware megakernel parity: ``ilqr_solve_fused`` vs ``ilqr_solve``.

The whole-solve megakernel (ops/fused_solve.py) is equality-tested in f64
interpret mode at small shapes (tests/test_fused_solve.py), which cannot see
f32-on-TPU effects. At production shapes the two forms accumulate float32
noise differently (different fusion/summation orders), and near the
convergence tolerance that noise can flip the final iteration count — the
round-3 review measured cost 106.7726/12-iter (megakernel) vs
106.7824/11-iter (while solve) at the H=50 quadrotor config, |dcost| ~ 1e-2
on a cost of ~107 (9e-5 relative).

This harness pins that band on real hardware: for a sweep of initial states
it runs both forms at identical configs and asserts

- relative cost agreement within COST_BAND (1e-3 — 10x the observed gap);
- iteration counts within ITER_BAND (2);
- a converged-flag flip is tolerated ONLY when the cost gap is inside the
  band (a near-tolerance flip, not a divergence).

Exit 0 = parity holds; the JSON record is the canonical artifact.

Usage: python benchmarks/megakernel_parity.py [--json out.json]
       (~5 min cold Mosaic compile for the megakernel; cached after.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

COST_BAND = 1e-3  # relative; observed f32 gap ~9e-5
ITER_BAND = 2

INITIAL_POSES = (  # (z, roll) around the hover task, easy -> hard
    (0.45, 0.05), (0.30, 0.10), (0.20, 0.15), (0.55, -0.12), (0.35, -0.20),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--max-iter", type=int, default=12)
    args = parser.parse_args()

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass

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
    config = ILQRConfig(tol=1e-3, max_iter=args.max_iter, riccati="seq")

    mega = jax.jit(lambda x, u: ilqr_solve_fused(dyn, cost, fcost, x, u, config))
    base = jax.jit(lambda x, u: ilqr_solve(dyn, cost, fcost, x, u, config))

    u0 = jnp.full((horizon, 4), 2.4525, dtype=jnp.float32)
    rows = []
    ok = True
    t0 = time.time()
    for z, roll in INITIAL_POSES:
        x0 = jnp.zeros(12, jnp.float32).at[2].set(z).at[6].set(roll)
        sm = mega(x0, u0)
        sb = base(x0, u0)
        cm, cb = float(sm.cost), float(sb.cost)
        im, ib = int(sm.iterations), int(sb.iterations)
        km, kb = bool(sm.converged), bool(sb.converged)
        rel = abs(cm - cb) / max(abs(cb), 1e-9)
        # A converged-flag flip is acceptable by itself ONLY because the cost
        # band is already enforced (a near-tolerance flip, not a divergence);
        # the flags are recorded for the artifact but do not gate beyond that.
        row_ok = rel < COST_BAND and abs(im - ib) <= ITER_BAND
        ok &= row_ok
        rows.append({
            "pose_z_roll": [z, roll],
            "cost_megakernel": cm, "cost_while": cb, "rel_cost_gap": rel,
            "iters_megakernel": im, "iters_while": ib,
            "converged_megakernel": km, "converged_while": kb,
            "ok": row_ok,
        })
        print(f"z={z} roll={roll}: mega {cm:.4f}/{im}it/{km} vs while "
              f"{cb:.4f}/{ib}it/{kb} rel={rel:.2e} {'OK' if row_ok else 'FAIL'}",
              flush=True)

    out = {
        "backend": jax.default_backend(),
        "config": {"horizon": horizon, "tol": 1e-3, "max_iter": args.max_iter,
                   "cost_band_rel": COST_BAND, "iter_band": ITER_BAND},
        "elapsed_s": time.time() - t0,
        "rows": rows,
        "parity": bool(ok),
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
