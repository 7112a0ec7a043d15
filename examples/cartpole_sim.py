"""Headless cart-pole MPC simulation against the MuJoCo validation plant.

TPU-native counterpart of the reference's flagship demo
(examples/cartpole/cartpole_sim.py:14-221): the controller runs as one jitted
computation per step; the plant is an independent MuJoCo model (real model
mismatch). GLFW/teleop are intentionally not rebuilt (SURVEY.md §8.4);
trajectories are logged to npz for offline inspection.

Usage:
    python examples/cartpole_sim.py --mode ilqr --steps 1000 --angle 0.2
    python examples/cartpole_sim.py --mode hybrid --checkpoint <dir-or-npz>
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
    parser.add_argument("--mode", default="ilqr", choices=["ilqr", "hybrid", "lqr", "blend"])
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--horizon", type=int, default=30)
    parser.add_argument("--position", type=float, default=0.0)
    parser.add_argument("--angle", type=float, default=0.2)
    parser.add_argument(
        "--checkpoint",
        default=None,
        help="GainPredictor npz, or a reference torch checkpoint directory",
    )
    parser.add_argument("--log", default=None, help="npz output path for the trajectory")
    args = parser.parse_args()

    import jax.numpy as jnp

    from quattro_tpu.control import make_cartpole_mpc
    from quattro_tpu.sim import CartPoleBridge

    predict_fn = None
    prompt_len = None
    if args.mode in ("hybrid", "blend") and args.checkpoint:
        if os.path.isdir(args.checkpoint):
            from quattro_tpu.models.torch_port import load_torch_checkpoint

            predictor = load_torch_checkpoint(args.checkpoint)
        else:
            from quattro_tpu.models import GainPredictor

            predictor = GainPredictor.load(args.checkpoint)
        predict_fn = predictor.predict_fn()
        prompt_len = predictor.prompt_len

    controller = make_cartpole_mpc(
        horizon=args.horizon, mode=args.mode, predict_fn=predict_fn, prompt_len=prompt_len
    )
    state = controller.init_state()

    plant = CartPoleBridge()
    plant.reset(position=args.position, angle=args.angle)

    states, controls, latencies = [], [], []
    for step in range(args.steps):
        x = plant.read_state()
        t0 = time.perf_counter()
        u, _, state = controller.step(jnp.asarray(x, dtype=jnp.float32), state)
        u_host = float(np.asarray(u)[0])
        latencies.append(time.perf_counter() - t0)
        plant.apply_control(u_host)
        plant.step()
        states.append(x)
        controls.append(u_host)
        if step % 200 == 0:
            print(
                f"step {step}: |x|={np.linalg.norm(x):.4f} u={u_host:+.3f} "
                f"latency={latencies[-1] * 1e3:.2f} ms",
                flush=True,
            )

    states = np.asarray(states)
    summary = {
        "final_state_norm": float(np.linalg.norm(states[-1])),
        "mean_latency_ms": float(np.mean(latencies[10:]) * 1e3),
        "p99_latency_ms": float(np.percentile(latencies[10:], 99) * 1e3),
        "steps": args.steps,
        "mode": args.mode,
    }
    print(json.dumps(summary))

    if args.log:
        np.savez(args.log, states=states, controls=np.asarray(controls), latencies=np.asarray(latencies))
        print(f"trajectory written to {args.log}")


if __name__ == "__main__":
    main()
