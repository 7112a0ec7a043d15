"""Collect gain-prediction training data and fit the transformer, end to end.

TPU-native counterpart of the reference's two-stage offline pipeline
(examples/*/training/training_data_collection.py + transformer_training.py):
the 10-process MuJoCo sweep becomes ONE vmapped on-device sweep of
receding-horizon solves with per-iteration logging, and the torch fit becomes
the optax trainer. Collection and training both run on the accelerator.

Usage:
    python examples/collect_and_train.py --system cartpole \
        --num-inits 64 --sim-steps 100 --epochs 60 --out cartpole_gain.npz
    python examples/collect_and_train.py --system quadrotor \
        --num-inits 48 --sim-steps 80 --epochs 60 --out quadrotor_gain.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cartpole_setup(horizon):
    import jax.numpy as jnp

    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(4)
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), x_ref)
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), x_ref)
    return dyn, cost, fcost, 4, 1


def quadrotor_setup(horizon):
    import jax.numpy as jnp

    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(12).at[2].set(0.5)
    q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
    qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
    cost = make_quadratic_cost(q, jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0)
    fcost = make_quadratic_final_cost(qf, x_ref)
    return dyn, cost, fcost, 12, 4


def initial_states(system, num, key):
    """Grid sweep for cart-pole (reference: pos x angle arange(-0.5, 0.51,
    0.05), training_data_collection.py:297-298); LHS over pose bounds for the
    quadrotor (reference: scipy.qmc LatinHypercube, :269-288)."""
    import jax.numpy as jnp

    from quattro_tpu.training import lhs_initial_states

    if system == "cartpole":
        side = int(np.ceil(np.sqrt(num)))
        pos = np.linspace(-0.5, 0.5, side)
        ang = np.linspace(-0.5, 0.5, side)
        grid = np.stack(np.meshgrid(pos, ang), axis=-1).reshape(-1, 2)[:num]
        x0 = np.zeros((num, 4))
        x0[:, 0] = grid[:, 0]
        x0[:, 2] = grid[:, 1]
        return jnp.asarray(x0, dtype=jnp.float32)

    lower = jnp.array([-0.5, -0.5, 0.1, -0.3, -0.3, -0.3])
    upper = jnp.array([0.5, 0.5, 0.9, 0.3, 0.3, 0.3])
    pose = lhs_initial_states(key, lower, upper, num)  # x, y, z, r, p, y
    x0 = jnp.zeros((num, 12))
    x0 = x0.at[:, 0:3].set(pose[:, 0:3])
    x0 = x0.at[:, 6:9].set(pose[:, 3:6])
    return x0.astype(jnp.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--system", required=True, choices=["cartpole", "quadrotor"])
    parser.add_argument("--horizon", type=int, default=None)
    parser.add_argument("--prompt-len", type=int, default=None)
    parser.add_argument("--num-inits", type=int, default=64)
    parser.add_argument("--sim-steps", type=int, default=100)
    parser.add_argument("--max-iter", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--d-model", type=int, default=128)
    parser.add_argument("--nhead", type=int, default=4)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--ff", type=int, default=None)
    parser.add_argument("--out", required=True, help="output GainPredictor npz path")
    parser.add_argument("--dataset-out", default=None,
                        help="optional dataset dump: .qtshard (native validated shards) or .npz")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quattro_tpu.models import GainPredictor
    from quattro_tpu.solver import ILQRConfig
    from quattro_tpu.training import GainDataset, TrainConfig, collect_gain_dataset, train_gain_predictor

    # Reference hyperparameter defaults per system (SURVEY.md C25).
    if args.system == "cartpole":
        horizon = args.horizon or 30
        prompt_len = args.prompt_len or 5
        ff = args.ff or 256
        max_seq_len = 100
        tol = 1e-1
        setup = cartpole_setup
    else:
        horizon = args.horizon or 50
        prompt_len = args.prompt_len or 1
        ff = args.ff or 512
        max_seq_len = 110
        tol = 1e-3
        setup = quadrotor_setup

    dyn, cost, fcost, n, m = setup(horizon)
    key = jax.random.PRNGKey(0)
    x0s = initial_states(args.system, args.num_inits, key)

    print(f"collecting: {args.num_inits} inits x {args.sim_steps} MPC steps "
          f"x <= {args.max_iter} iLQR iters (horizon {horizon})", flush=True)
    t0 = time.time()
    dataset = collect_gain_dataset(
        dyn, cost, fcost, x0s, horizon, m, args.sim_steps,
        config=ILQRConfig(tol=tol, max_iter=args.max_iter),
    )
    print(f"collected {dataset.x_data.shape[0]} rows in {time.time() - t0:.1f}s", flush=True)
    if args.dataset_out:
        from quattro_tpu.training import save_gain_dataset

        save_gain_dataset(args.dataset_out, dataset)

    # 80/20 split, shuffled with a fixed seed (transformer_training.py:45-56).
    rng = np.random.default_rng(42)
    perm = rng.permutation(dataset.x_data.shape[0])
    split = int(len(perm) * 0.8)
    train = GainDataset(dataset.x_data[perm[:split]], dataset.kk_data[perm[:split]])
    test = GainDataset(dataset.x_data[perm[split:]], dataset.kk_data[perm[split:]])

    predictor = GainPredictor.create(
        state_dim=n,
        control_dim=m * (1 + n),
        prompt_len=prompt_len,
        target_len=horizon - prompt_len,
        d_model=args.d_model,
        nhead=args.nhead,
        num_decoder_layers=args.layers,
        dim_feedforward=ff,
        max_seq_len=max_seq_len,
        seq_len_states=horizon + 1,
    )
    print(f"training {predictor.num_params():,}-param model "
          f"({args.epochs} epochs, batch {args.batch_size})", flush=True)
    t0 = time.time()
    result = train_gain_predictor(
        predictor, train, test,
        TrainConfig(num_epochs=args.epochs, batch_size=args.batch_size,
                    learning_rate=args.learning_rate),
    )
    print(f"trained in {time.time() - t0:.1f}s", flush=True)

    result.predictor.save(args.out)
    print(json.dumps({
        "rows": int(dataset.x_data.shape[0]),
        "params": int(result.predictor.num_params()),
        "final_train_loss": float(result.train_loss_history[-1]),
        "final_test_loss": float(result.test_loss_history[-1]) if len(result.test_loss_history) else None,
        "checkpoint": args.out,
    }))


if __name__ == "__main__":
    main()
