"""Perf-regression lane: fresh runs vs the committed canonical JSONs.

The headline (bench.py) and the canonical suite numbers drift a few percent
between rounds with no guard; this check re-measures a small, fast set of
load-bearing numbers (everything compile-cached after one full bench round)
and FAILS LOUDLY if any regresses beyond the tolerance band vs its
committed artifact:

- the fused batched Riccati kernels (batch2d f32 / bf16-stream, colmajor
  f32) per-chunk time vs ``tile_sweep_tpu.json``;
- the pod-scale aggregate rows vs ``results_tpu.json`` ``pod_scale``;
- the single-trajectory fused-solver MPC step vs ``mpc_latency_tpu.json``
  (``ilqr_fused`` device row).

A fresh number FASTER than the artifact never fails (improvements are
recorded at the next artifact refresh); slower than ``(1 + tol)`` x the
committed value fails. Default tol 0.15 — the measured cross-round drift
band is a few percent, the rig's fetch-RTT noise a few more.

Usage: python benchmarks/perf_check.py [--tol 0.15]
Exit 0 = all inside the band; 1 = regression (prints each offender).
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

HERE = os.path.dirname(os.path.abspath(__file__))


def load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tol", type=float, default=0.15)
    args = parser.parse_args()
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass
    if jax.default_backend() != "tpu":
        print("SKIP: perf check needs the TPU rig")
        return 0

    from suite import _time_pipelined, random_lq_problem

    from quattro_tpu.ops.fused_riccati import (
        riccati_backward_batched_fused,
        riccati_backward_batched_fused2d,
    )

    failures = []

    def check(label, fresh_s, committed_s):
        ratio = fresh_s / committed_s
        ok = ratio <= 1.0 + args.tol
        print(f"{label}: fresh {fresh_s*1e3:.2f} ms vs committed "
              f"{committed_s*1e3:.2f} ms (x{ratio:.2f}) "
              f"{'OK' if ok else 'REGRESSION'}", flush=True)
        if not ok:
            failures.append(label)

    # --- fused kernels vs tile_sweep_tpu.json (repeats=8 methodology) ----
    sweep = load("tile_sweep_tpu.json")
    n, m, H = 12, 4, 1024
    for label, batch, fn in (
        ("batch2d_B1024_ts8_bt2", 1024,
         lambda a, b, e, vx, vxx: riccati_backward_batched_fused2d(
             a, b, e, vx, vxx, tile_s=8, block_t=2)[0]),
        ("batch2d_B1024_ts8_bt4_bf16", 1024,
         lambda a, b, e, vx, vxx: riccati_backward_batched_fused2d(
             a, b, e, vx, vxx, tile_s=8, block_t=4,
             stream_dtype=jnp.bfloat16)[0]),
        ("colmajor_B512_tile128_bt8", 512,
         lambda a, b, e, vx, vxx: riccati_backward_batched_fused(
             a, b, e, vx, vxx)[0]),
    ):
        if label not in sweep or "seconds" not in sweep[label]:
            print(f"{label}: no committed artifact row — skipping")
            continue
        a, b, exp, v_x, v_xx = random_lq_problem(batch, H, n, m)
        vx = jnp.broadcast_to(v_x, (batch, n))
        vxx = jnp.broadcast_to(v_xx, (batch, n, n))
        jfn = jax.jit(lambda aa, bb, ee, _f=fn, _vx=vx, _vxx=vxx: _f(aa, bb, ee, _vx, _vxx))
        sec = _time_pipelined(lambda *xs, _f=jfn: _f(*xs), (a, b, exp), repeats=8)
        check(label, sec, sweep[label]["seconds"])

    # --- pod-scale aggregate rows (repeats=16 methodology) ---------------
    results = load("results_tpu.json")
    pod = results.get("pod_scale", {})
    from suite import bench_pod_scale  # reuse the canonical runner wholesale

    fresh_pod = bench_pod_scale()
    for row in ("fused", "fused2d", "fused2d_bf16"):
        if row in pod and "seconds_total_4096xH1024" in pod.get(row, {}) \
                and "seconds_total_4096xH1024" in fresh_pod.get(row, {}):
            check(f"pod_scale/{row}", fresh_pod[row]["seconds_total_4096xH1024"],
                  pod[row]["seconds_total_4096xH1024"])

    # --- single-trajectory fused MPC step --------------------------------
    lat = load("mpc_latency_tpu.json")
    committed = lat.get("ilqr_fused", {}).get("device_ms_per_step")
    if committed:
        from mpc_latency import build, measure

        ctrl = build("ilqr_fused")
        _, device = measure(ctrl)
        check("mpc_latency/ilqr_fused_device", device, committed / 1e3)

    if failures:
        print(f"PERF REGRESSIONS: {failures}")
        return 1
    print("ALL PERF CHECKS INSIDE THE BAND")
    return 0


if __name__ == "__main__":
    sys.exit(main())
