"""Quadrotor MPC control-step latency: ours (TPU) vs the reference (host CPU).

The reference README's headline "overall MPC speedup" (README.md:31-33,
17.8x hybrid-vs-pure on Apple M4 Pro) is a per-control-step wall-time
comparison. This script measures OUR per-control-step time for the same
workload (quadrotor hover task, H=50, warm-started receding horizon,
shipped-checkpoint transformer for the hybrid mode). The companion reference
numbers on THIS host are stored in bench_baseline.json (measured with the
reference's own code: pure NumPy FD iLQR + torch-CPU transformer).

Two timing modes:
- pipelined: N steps dispatched back-to-back (device throughput; hides the
  ~25 ms axon tunnel round-trip of this rig, which a local host would not pay)
- blocking: block_until_ready per step (what a host-in-the-loop sim would see
  on this rig, tunnel included)
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


def build(mode: str):
    from quattro_tpu.control import make_quadrotor_mpc
    from quattro_tpu.models.torch_port import QUADROTOR_CHECKPOINT, load_torch_checkpoint

    if mode == "hybrid":
        pred = load_torch_checkpoint(QUADROTOR_CHECKPOINT)
        ctrl = make_quadrotor_mpc(
            horizon=50, mode="hybrid", predict_fn=pred.predict_fn(),
            prompt_len=pred.prompt_len,
        )
    else:
        ctrl = make_quadrotor_mpc(horizon=50)
    return ctrl


def measure(ctrl, steps=50):
    x = jnp.zeros(12).at[2].set(0.2).at[6].set(0.1)
    state = ctrl.init_state()
    out = ctrl.step(x, state)  # compile
    jax.block_until_ready(out[0])

    # Blocking per-step (tunnel-included on this rig).
    state_b = ctrl.init_state()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = ctrl.step(x, state_b)
        state_b = out[-1]
        jax.block_until_ready(out[0])
    blocking = (time.perf_counter() - t0) / steps

    # Pipelined: dispatch all steps, block once (device time per step).
    state_p = ctrl.init_state()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = ctrl.step(x, state_p)
        state_p = out[-1]
    jax.block_until_ready(out[0])
    pipelined = (time.perf_counter() - t0) / steps
    return blocking, pipelined


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    results = {"backend": jax.default_backend()}
    for mode in ("ilqr", "hybrid"):
        blocking, pipelined = measure(build(mode))
        results[mode] = {
            "blocking_ms_per_step": blocking * 1e3,
            "pipelined_ms_per_step": pipelined * 1e3,
        }
        print(f"{mode}: blocking {blocking*1e3:.2f} ms/step, "
              f"pipelined {pipelined*1e3:.2f} ms/step", flush=True)

    # Reference numbers measured on this host with the reference's own code.
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                             "bench_baseline.json")
    try:
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("reference_mpc_step_ms", {})
        for mode in ("ilqr", "hybrid"):
            key = {"ilqr": "pure", "hybrid": "hybrid"}[mode]
            if key in ref:
                ours = results[mode]["pipelined_ms_per_step"]
                results[mode]["vs_reference_same_host"] = ref[key] / ours
                print(f"{mode}: {ref[key]/ours:.0f}x the reference on this host "
                      f"({ref[key]:.0f} ms -> {ours:.2f} ms)", flush=True)
    except (OSError, json.JSONDecodeError):
        pass

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
