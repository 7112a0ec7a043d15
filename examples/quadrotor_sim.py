"""Headless quadrotor MPC simulation against the MuJoCo validation plant.

TPU-native counterpart of examples/quadrotor/quadrotor_sim.py:51-264: the
solver's analytic model is parameterized from the COMPILED MuJoCo model's
measured mass/inertia/arm (quadrotor_wrapper.py semantics), MPC runs every
``--decimation`` physics steps (reference: 20 x 1 ms), per-step latency is
reported.

Usage:
    python examples/quadrotor_sim.py --steps 4000 --z 0.2 --roll 0.1
    python examples/quadrotor_sim.py --mode hybrid --checkpoint <dir-or-npz>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", default="ilqr", choices=["ilqr", "hybrid"])
    parser.add_argument("--steps", type=int, default=4000, help="physics steps (1 ms each)")
    parser.add_argument("--decimation", type=int, default=20, help="physics steps per MPC step")
    parser.add_argument("--horizon", type=int, default=50)
    parser.add_argument("--x", type=float, default=0.0)
    parser.add_argument("--y", type=float, default=0.0)
    parser.add_argument("--z", type=float, default=0.2)
    parser.add_argument("--roll", type=float, default=0.0)
    parser.add_argument("--pitch", type=float, default=0.0)
    parser.add_argument("--yaw", type=float, default=0.0)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--log", default=None)
    args = parser.parse_args()

    import jax.numpy as jnp

    from quattro_tpu.control import make_quadrotor_mpc
    from quattro_tpu.sim import QuadrotorBridge

    plant = QuadrotorBridge()
    print("measured plant params:", plant.solver_params())

    predict_fn = None
    prompt_len = None
    if args.mode == "hybrid" and args.checkpoint:
        if os.path.isdir(args.checkpoint):
            from quattro_tpu.models.torch_port import load_torch_checkpoint

            predictor = load_torch_checkpoint(args.checkpoint)
        else:
            from quattro_tpu.models import GainPredictor

            predictor = GainPredictor.load(args.checkpoint)
        predict_fn = predictor.predict_fn()
        prompt_len = predictor.prompt_len

    controller = make_quadrotor_mpc(
        horizon=args.horizon,
        mode=args.mode,
        predict_fn=predict_fn,
        prompt_len=prompt_len,
        quad_params=plant.solver_params(),
    )
    state = controller.init_state()
    plant.reset(position=(args.x, args.y, args.z), rpy=(args.roll, args.pitch, args.yaw))

    x_ref = np.zeros(12)
    x_ref[2] = 0.5

    states, latencies = [], []
    u_host = np.zeros(4)
    mpc_calls = 0
    for step in range(args.steps):
        if step % args.decimation == 0:
            x = plant.read_state()
            t0 = time.perf_counter()
            u, _, state = controller.step(jnp.asarray(x, dtype=jnp.float32), state)
            u_host = np.asarray(u)
            latencies.append(time.perf_counter() - t0)
            mpc_calls += 1
            plant.apply_thrusts(u_host)
            states.append(x)
            if mpc_calls % 25 == 1:
                print(
                    f"mpc {mpc_calls}: err={np.linalg.norm(x - x_ref):.4f} "
                    f"u={np.round(u_host, 2)} latency={latencies[-1] * 1e3:.2f} ms",
                    flush=True,
                )
        plant.step()

    states = np.asarray(states)
    summary = {
        "final_error": float(np.linalg.norm(states[-1] - x_ref)),
        "mean_latency_ms": float(np.mean(latencies[5:]) * 1e3),
        "p99_latency_ms": float(np.percentile(latencies[5:], 99) * 1e3),
        "mpc_calls": mpc_calls,
        "mode": args.mode,
    }
    print(json.dumps(summary))

    if args.log:
        np.savez(args.log, states=states, latencies=np.asarray(latencies))
        print(f"trajectory written to {args.log}")


if __name__ == "__main__":
    main()
