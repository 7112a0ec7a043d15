"""Extended benchmark suite: per-phase and scaling measurements.

``bench.py`` at the repo root prints the single headline JSON line; this
suite produces the full table for BASELINE.md comparisons:

1. riccati_blocknnz   block-nnz/s of the Riccati factorization — the
                      north-star throughput metric — sequential-scan vs
                      associative-scan at three shapes. Measured crossover
                      (v5e): the associative form wins ~3x on SINGLE-
                      trajectory latency at long H (its O(log H) depth);
                      with a trajectory batch >= ~8 the vmapped sequential
                      scan wins ~8x (the batch axis already fills the MXU and
                      each element combine costs ~12x a plain Riccati step).
                      ``riccati_backward_auto`` encodes this dispatch.
2. hybrid_speedup     per-iteration wall time of the hybrid (tail window +
                      transformer) iteration vs the full-horizon iteration —
                      the reference's headline per-iteration comparison
                      (README.md:29 claims 5.3x cart-pole / 27x quadrotor).
3. batch_throughput   trajectories/sec of the vmapped batched solver
                      (replaces the reference's 10-process pool).

Usage: python benchmarks/suite.py [--json out.json]
All timings pipeline dispatches (block only at the end of each repeat batch)
so tunnel round-trips don't pollute device throughput.
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


def _time_pipelined(fn, args, repeats=20, warmup=2):
    """Median wall time per call with pipelined dispatch."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / repeats


def bench_riccati_blocknnz():
    from quattro_tpu.solver.derivatives import CostExpansion
    from quattro_tpu.solver.riccati import riccati_backward, riccati_backward_associative

    results = {}
    key = jax.random.PRNGKey(0)
    for label, (batch, horizon, n, m) in {
        "mpc_scale_H100": (1, 100, 12, 4),
        "latency_scale_H1024": (1, 1024, 12, 4),
        "pod_feed_H1024": (64, 1024, 12, 4),
    }.items():
        ks = jax.random.split(key, 8)
        shape = (batch, horizon) if batch > 1 else (horizon,)
        a = jnp.eye(n) + 0.01 * jax.random.normal(ks[0], (*shape, n, n))
        b = 0.05 * jax.random.normal(ks[1], (*shape, n, m))
        w = jax.random.normal(ks[2], (*shape, n, n))
        exp = CostExpansion(
            l_x=jax.random.normal(ks[3], (*shape, n)),
            l_u=jax.random.normal(ks[4], (*shape, m)),
            l_xx=0.1 * jnp.einsum("...ij,...kj->...ik", w, w) + 0.1 * jnp.eye(n),
            l_uu=jnp.broadcast_to(jnp.eye(m), (*shape, m, m)),
            l_ux=0.01 * jax.random.normal(ks[5], (*shape, m, n)),
        )
        v_x = jax.random.normal(ks[6], (n,))
        wf = jax.random.normal(ks[7], (n, n))
        v_xx = wf @ wf.T + jnp.eye(n)

        for name, backward in (
            ("sequential", riccati_backward),
            ("associative", riccati_backward_associative),
        ):
            if batch > 1:
                fn = jax.jit(
                    jax.vmap(lambda aa, bb, ee: backward(aa, bb, ee, v_x, v_xx), in_axes=(0, 0, 0))
                )
                args = (a, b, exp)
            else:
                fn = jax.jit(lambda aa, bb, ee: backward(aa, bb, ee, v_x, v_xx))
                args = (a, b, exp)
            elapsed = _time_pipelined(lambda *xs: fn(*xs).k_seq, args)
            nnz = batch * (horizon + 2 * (horizon - 1))
            results[f"{label}/{name}"] = {
                "seconds": elapsed,
                "block_nnz_per_sec": nnz / elapsed,
            }
    return results


def bench_hybrid_speedup():
    """Per-iteration time: full-horizon backward vs tail-window + transformer."""
    from quattro_tpu.models import GainPredictor
    from quattro_tpu.solver import (
        ILQRConfig,
        hybrid_ilqr_solve,
        ilqr_solve,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import cartpole_dynamics, make_discrete, quadrotor_dynamics

    results = {}
    systems = {
        "cartpole_H30": dict(
            dyn=make_discrete(cartpole_dynamics, 0.01, "rk4"),
            n=4, m=1, horizon=30, prompt=5,
            q=jnp.array([5.0, 0.1, 10.0, 0.1]), r=jnp.array([0.001]),
            qf=jnp.array([50.0, 6.0, 100.0, 0.1]), x_ref=jnp.zeros(4),
            x0=jnp.array([0.2, 0.0, 0.3, 0.0]), barrier=0.0,
            d_model=128, ff=256, max_seq=100,
        ),
        "quadrotor_H50": dict(
            dyn=make_discrete(quadrotor_dynamics, 0.01, "rk4"),
            n=12, m=4, horizon=50, prompt=1,
            q=jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
            r=jnp.full((4,), 0.01),
            qf=jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]),
            x_ref=jnp.zeros(12).at[2].set(0.5),
            x0=jnp.zeros(12).at[2].set(0.2).at[6].set(0.1), barrier=1000.0,
            d_model=128, ff=512, max_seq=110,
        ),
    }
    iters = 4
    for label, cfg in systems.items():
        cost = make_quadratic_cost(cfg["q"], cfg["r"], cfg["x_ref"], barrier_alpha=cfg["barrier"])
        fcost = make_quadratic_final_cost(cfg["qf"], cfg["x_ref"])
        pred = GainPredictor.create(
            state_dim=cfg["n"], control_dim=cfg["m"] * (1 + cfg["n"]),
            prompt_len=cfg["prompt"], target_len=cfg["horizon"] - cfg["prompt"],
            d_model=cfg["d_model"], nhead=4, num_decoder_layers=3,
            dim_feedforward=cfg["ff"], max_seq_len=cfg["max_seq"],
            seq_len_states=cfg["horizon"] + 1,
        )
        u0 = jnp.zeros((cfg["horizon"], cfg["m"]))
        solve_cfg = ILQRConfig(tol=0.0, max_iter=iters)

        pure = jax.jit(lambda x, u: ilqr_solve(cfg["dyn"], cost, fcost, x, u, solve_cfg))
        hybrid = jax.jit(
            lambda x, u: hybrid_ilqr_solve(
                cfg["dyn"], cost, fcost, pred.predict_fn(), cfg["prompt"],
                x, u, cfg["x_ref"], solve_cfg,
            )
        )
        t_pure = _time_pipelined(lambda x, u: pure(x, u).cost, (cfg["x0"], u0)) / iters
        t_hybrid = _time_pipelined(lambda x, u: hybrid(x, u).cost, (cfg["x0"], u0)) / iters
        results[label] = {
            "pure_iter_s": t_pure,
            "hybrid_iter_s": t_hybrid,
            "hybrid_vs_pure_speedup": t_pure / t_hybrid,
        }
    return results


def bench_batch_throughput():
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    x_ref = jnp.zeros(12).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]), x_ref
    )
    results = {}
    key = jax.random.PRNGKey(0)
    for batch in (64, 512, 2048):
        x0s = jnp.zeros((batch, 12)).at[:, 2].set(
            0.2 + 0.3 * jax.random.uniform(key, (batch,))
        )
        u0s = jnp.zeros((batch, 50, 4))
        cfg = ILQRConfig(tol=0.0, max_iter=4)
        fn = jax.jit(lambda x, u: batched_ilqr_solve(dyn, cost, fcost, x, u, cfg).cost)
        elapsed = _time_pipelined(fn, (x0s, u0s), repeats=5)
        results[f"batch_{batch}"] = {
            "seconds": elapsed,
            "solves_per_sec": batch / elapsed,
        }
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument(
        "--only", default=None, choices=["riccati", "hybrid", "batch"], help="run one section"
    )
    args = parser.parse_args()

    out = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    if args.only in (None, "riccati"):
        out["riccati_blocknnz"] = bench_riccati_blocknnz()
        print(json.dumps({"riccati_blocknnz": out["riccati_blocknnz"]}, indent=2), flush=True)
    if args.only in (None, "hybrid"):
        out["hybrid_speedup"] = bench_hybrid_speedup()
        print(json.dumps({"hybrid_speedup": out["hybrid_speedup"]}, indent=2), flush=True)
    if args.only in (None, "batch"):
        out["batch_throughput"] = bench_batch_throughput()
        print(json.dumps({"batch_throughput": out["batch_throughput"]}, indent=2), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
