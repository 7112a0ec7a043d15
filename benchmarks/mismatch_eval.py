"""Closed-loop robustness: model-plant vs MuJoCo-mismatch training data.

The reference's training rows come from closed-loop *MuJoCo* sims
(training_data_collection.py:78-88), so its training distribution includes
plant-model mismatch; round-1 collection only supported the solver's own
model as the plant. This harness compares checkpoints from both
distributions driving the RAW hybrid MPC (``exact_fallback=False`` — the
certified mode would mask data-quality differences with exact iterations)
against the mismatched MuJoCo cart-pole from held-out initial angles.

Usage: python benchmarks/mismatch_eval.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CHECKPOINTS = {
    "model_plant": "checkpoints/cartpole_gain.npz",
    "mujoco_mismatch": "checkpoints/cartpole_gain_mismatch.npz",
}
HELD_OUT_ANGLES = (-0.33, -0.17, 0.12, 0.27, 0.38)
STEPS = 900
SETTLE_NORM = 0.05


def run_one(predictor, angle):
    import jax.numpy as jnp

    from quattro_tpu.control import make_cartpole_mpc
    from quattro_tpu.sim import CartPoleBridge

    controller = make_cartpole_mpc(
        mode="hybrid", predict_fn=predictor.predict_fn(),
        prompt_len=predictor.prompt_len, exact_fallback=False,
    )
    state = controller.init_state()
    plant = CartPoleBridge()
    plant.reset(position=0.0, angle=angle)

    norms = []
    for _ in range(STEPS):
        x = plant.read_state()
        u, _, state = controller.step(jnp.asarray(x, dtype=jnp.float32), state)
        plant.apply_control(float(np.asarray(u)[0]))
        plant.step()
        norms.append(float(np.linalg.norm(plant.read_state())))
    norms = np.asarray(norms)
    # Settle = first step after which the norm stays below the bar.
    below = norms < SETTLE_NORM
    settle = None
    for t in range(len(norms)):
        if below[t:].all():
            settle = t
            break
    return {
        "angle": angle,
        "settle_step": settle,
        "final_norm": float(norms[-1]),
        "max_norm_after_200": float(norms[200:].max()),
        "stabilized": bool(norms[-1] < 0.1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    from quattro_tpu.models import GainPredictor

    out = {}
    for name, path in CHECKPOINTS.items():
        if not os.path.exists(path):
            print(f"{name}: {path} missing, skipped", flush=True)
            continue
        predictor = GainPredictor.load(path)
        runs = [run_one(predictor, a) for a in HELD_OUT_ANGLES]
        settles = [r["settle_step"] for r in runs if r["settle_step"] is not None]
        out[name] = {
            "checkpoint": path,
            "runs": runs,
            "stabilized": sum(r["stabilized"] for r in runs),
            "total": len(runs),
            "median_settle_step": float(np.median(settles)) if settles else None,
        }
        print(f"{name}: {out[name]['stabilized']}/{out[name]['total']} stabilized, "
              f"median settle {out[name]['median_settle_step']}", flush=True)

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
