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


# Quadrotor LHS pose envelopes (x, y, z, roll, pitch, yaw).
# "reference" matches the reference's near-hover collection bounds
# (quadrotor training_data_collection.py:272-274) — the shipped 616.2k
# checkpoint's training distribution; "wide" is this repo's broader envelope.
QUAD_ENVELOPES = {
    "reference": ((-0.3, -0.3, 0.49, -0.2, -0.2, -0.5),
                  (0.3, 0.3, 0.51, 0.2, 0.2, 0.5)),
    "wide": ((-0.5, -0.5, 0.1, -0.3, -0.3, -0.3),
             (0.5, 0.5, 0.9, 0.3, 0.3, 0.3)),
}


def initial_states(system, num, key, envelope="wide"):
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

    lo, hi = QUAD_ENVELOPES[envelope]
    lower = jnp.array(lo)
    upper = jnp.array(hi)
    pose = lhs_initial_states(key, lower, upper, num)  # x, y, z, r, p, y
    x0 = jnp.zeros((num, 12))
    x0 = x0.at[:, 0:3].set(pose[:, 0:3])
    x0 = x0.at[:, 6:9].set(pose[:, 3:6])
    return x0.astype(jnp.float32)


def mujoco_plant_adapters(system):
    """(reset_fn, read_fn, apply_fn, step_fn, substeps, solver-params) for
    host-loop collection against the MuJoCo plant — the reference's actual
    training distribution includes this model mismatch
    (training_data_collection.py:78-88)."""
    from quattro_tpu.sim import CartPoleBridge, QuadrotorBridge

    if system == "cartpole":
        bridge = CartPoleBridge()

        def reset_fn(x0):
            bridge.reset(position=float(x0[0]), angle=float(x0[2]))

        def apply_fn(u):
            bridge.apply_control(float(u[0]))

        return reset_fn, bridge.read_state, apply_fn, bridge.step, 1, None

    bridge = QuadrotorBridge()

    def reset_fn(x0):
        bridge.reset(position=(float(x0[0]), -float(x0[1]), float(x0[2])),
                     rpy=(float(x0[6]), float(x0[7]), float(x0[8])))

    return (reset_fn, bridge.read_state, bridge.apply_thrusts, bridge.step,
            20, bridge.solver_params())


def mujoco_plant_adapters_batched(system, count):
    """``count`` independent plant adapter tuples for the lockstep batched
    host-loop collector (one MuJoCo instance per lane), plus (substeps,
    measured-params)."""
    from quattro_tpu.sim import CartPoleBridge, QuadrotorBridge

    plants = []
    if system == "cartpole":
        for _ in range(count):
            b = CartPoleBridge()
            plants.append((
                lambda x0, b=b: b.reset(position=float(x0[0]), angle=float(x0[2])),
                b.read_state,
                lambda u, b=b: b.apply_control(float(u[0])),
                b.step,
            ))
        return plants, 1, None
    measured = None
    for _ in range(count):
        b = QuadrotorBridge()
        measured = b.solver_params()
        plants.append((
            lambda x0, b=b: b.reset(
                position=(float(x0[0]), -float(x0[1]), float(x0[2])),
                rpy=(float(x0[6]), float(x0[7]), float(x0[8])),
            ),
            b.read_state,
            b.apply_thrusts,
            b.step,
        ))
    return plants, 20, measured


def _drop_nonfinite_rows(dataset):
    """Drop rows with non-finite states or gain labels (host GainDataset).

    Non-finite rows (e.g. labels solved on a diverged on-policy DAgger lane)
    poison the z-score normalizer: one NaN makes every feature NaN and the
    whole training run with it. Applied to EVERY host dataset right before
    training, whether loaded from disk or freshly collected (streamed shard
    datasets filter at load instead, io/shardio.py).
    """
    from quattro_tpu.training import GainDataset

    if not isinstance(dataset, GainDataset):
        return dataset
    finite = (np.isfinite(dataset.x_data).all(axis=(1, 2))
              & np.isfinite(dataset.kk_data).all(axis=(1, 2)))
    if not finite.all():
        print(f"dropping {int((~finite).sum())} non-finite rows", flush=True)
        dataset = GainDataset(dataset.x_data[finite], dataset.kk_data[finite])
    return dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--system", required=True, choices=["cartpole", "quadrotor"])
    parser.add_argument("--plant", default="model",
                        choices=["model", "mujoco", "randomized"],
                        help="'model': vmapped on-device sweeps against the solver's own "
                             "dynamics; 'mujoco': host-loop closed-loop collection against "
                             "the MuJoCo plant (the reference's model-mismatch distribution); "
                             "'randomized': on-device domain randomization — every "
                             "trajectory's plant gets independently perturbed physical "
                             "parameters (--plant-rel), solver keeps the nominal model")
    parser.add_argument("--plant-rel", type=float, default=0.1,
                        help="relative parameter-perturbation range for --plant randomized")
    parser.add_argument("--horizon", type=int, default=None)
    parser.add_argument("--prompt-len", type=int, default=None)
    parser.add_argument("--num-inits", type=int, default=64)
    parser.add_argument("--envelope", default="wide", choices=sorted(QUAD_ENVELOPES),
                        help="quadrotor initial-pose LHS bounds: 'reference' = the "
                             "reference's near-hover collection envelope "
                             "(training_data_collection.py:272-274), 'wide' = this "
                             "repo's broader envelope (cart-pole ignores this)")
    parser.add_argument("--sim-steps", type=int, default=100)
    parser.add_argument("--parallel-plants", type=int, default=0,
                        help="with --plant mujoco: run this many MuJoCo instances "
                             "in lockstep with one vmapped solve per control step "
                             "(amortizes the dispatch RTT at reference collection "
                             "scale); 0 = sequential host loop")
    parser.add_argument("--max-iter", type=int, default=8)
    parser.add_argument("--dagger-checkpoint", default=None,
                        help="with --plant mujoco --parallel-plants: drive the "
                             "plants with this checkpoint's RAW hybrid MPC "
                             "(DAgger-style on-policy collection — rows still "
                             "labeled by the exact solver)")
    parser.add_argument("--compact-iters", type=int, default=None,
                        help="on-device valid-row compaction cap (mean accepted "
                             "iterations per MPC step) for --plant model/randomized; "
                             "bounds the device->host transfer on tunnel rigs")
    parser.add_argument("--device-resident", action="store_true",
                        help="keep the dataset in HBM end to end (collection rows "
                             "never cross the device->host link; training uses the "
                             "scanned-epoch path — one dispatch per epoch). Implies "
                             "--compact-iters (default 3); incompatible with "
                             "--plant mujoco and --dataset-out")
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--checkpoint-dir", default=None,
                        help="orbax mid-training checkpoint/resume directory "
                             "(long runs survive a crash)")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--lr-schedule", default="constant",
                        choices=["constant", "cosine"],
                        help="'constant' = reference fixed-lr Adam; 'cosine' "
                             "decays to ~0 over the run (large-dataset runs)")
    parser.add_argument("--patience", type=int, default=5,
                        help="early-stop patience on test loss; >= --epochs "
                             "disables early stopping (the reference's shipped "
                             "quadrotor checkpoint trained the full 200 epochs "
                             "with lr 2e-4, transformer_training.py:59)")
    parser.add_argument("--d-model", type=int, default=128)
    parser.add_argument("--nhead", type=int, default=4)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--ff", type=int, default=None)
    parser.add_argument("--max-seq-len", type=int, default=None,
                        help="transformer position budget; defaults to the per-system "
                             "reference value, or 2*horizon+16 for non-default horizons")
    parser.add_argument("--tol", type=float, default=None)
    parser.add_argument("--state-stride", type=int, default=1,
                        help="subsample the state context by this stride (long horizons)")
    parser.add_argument("--quad-params", default="measured",
                        choices=["measured", "nominal"],
                        help="quadrotor physical parameters for the solver model and "
                             "the randomization center in --plant model/randomized. "
                             "'measured' (default) reads mass/inertia/arm from the "
                             "compiled MuJoCo plant (quadrotor_wrapper.py:76-83 "
                             "semantics) — the reference ALWAYS parameter-matches its "
                             "solver this way, and the closed-loop eval/sim harnesses "
                             "do too, so collecting gains for the 'nominal' textbook "
                             "vehicle (mass 1.0, arm 0.1 vs measured 1.325, 0.228) "
                             "trains the predictor on a different aircraft than the "
                             "one it is deployed on. Falls back to nominal (loudly) "
                             "if MuJoCo is unavailable")
    parser.add_argument("--out", required=True, help="output GainPredictor npz path")
    parser.add_argument("--dataset-out", default=None,
                        help="optional dataset dump: .qtshard (native validated shards) or .npz")
    parser.add_argument("--dataset-in", default=None, nargs="+",
                        help="skip collection; train from saved dataset file(s)")
    parser.add_argument("--max-rows", type=int, default=None,
                        help="random row subsample cap after loading (HBM budget "
                             "for the device-resident trainer: ~13 KB/row at the "
                             "quadrotor shape on a 16 GB chip)")
    args = parser.parse_args()

    if args.dagger_checkpoint and not (args.plant == "mujoco" and args.parallel_plants):
        raise SystemExit("--dagger-checkpoint requires --plant mujoco with "
                         "--parallel-plants N (the batched lockstep collector "
                         "is the only policy-driven path)")
    if args.device_resident:
        if args.plant == "mujoco" and not args.parallel_plants:
            raise SystemExit("--device-resident requires an on-device plant "
                             "(--plant model/randomized) or the batched mujoco "
                             "host loop (--parallel-plants N, whose host rows "
                             "are uploaded flat for scanned-epoch training)")
        if args.dataset_out and args.plant != "mujoco":
            raise SystemExit("--device-resident keeps rows in HBM; --dataset-out "
                             "would force the full transfer this mode exists to avoid")
        if args.compact_iters is None:
            args.compact_iters = 3

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
    # Token budget: (H+1) state rows + prompt_len + (H - prompt_len) targets
    # = 2H+1 tokens. The reference values (100 / 110) only fit the reference
    # horizons; longer horizons get a derived budget.
    if args.max_seq_len is not None:
        max_seq_len = args.max_seq_len
    elif 2 * horizon + 1 > max_seq_len:
        max_seq_len = 2 * horizon + 16
    if args.tol is not None:
        tol = args.tol

    dyn, cost, fcost, n, m = setup(horizon)

    # Parameter-match the quadrotor solver model (and the randomization
    # center) to the compiled MuJoCo plant. The reference never uses the
    # textbook vehicle: QuadrotorWrapper builds the solver dynamics from the
    # measured mass/inertia/arm (quadrotor_wrapper.py:76-83), and so do this
    # repo's sim/eval harnesses — training gains for the nominal vehicle
    # would put the predictor out of distribution at deployment.
    quad_center = None
    if args.system == "quadrotor" and args.plant in ("model", "randomized"):
        if args.quad_params == "measured":
            try:
                from quattro_tpu.sim import QuadrotorBridge

                quad_center = QuadrotorBridge().solver_params()
            except Exception as exc:  # pragma: no cover - mujoco-less hosts
                print(f"WARNING: --quad-params measured unavailable ({exc}); "
                      f"falling back to nominal", flush=True)
        if quad_center is not None:
            from quattro_tpu.systems import make_discrete, quadrotor_dynamics

            dyn = make_discrete(
                lambda x, u: quadrotor_dynamics(x, u, quad_center), 0.01, "rk4"
            )
            print(f"solver model parameter-matched to MuJoCo: {quad_center}",
                  flush=True)

    key = jax.random.PRNGKey(0)
    x0s = initial_states(args.system, args.num_inits, key, envelope=args.envelope)

    t0 = time.time()
    solve_config = ILQRConfig(tol=tol, max_iter=args.max_iter)
    if args.dataset_in:
        from quattro_tpu.training import load_gain_dataset

        dataset = load_gain_dataset(args.dataset_in)
        print(f"loaded {dataset.x_data.shape[0]} rows from {args.dataset_in}", flush=True)
        dataset = _drop_nonfinite_rows(dataset)
        if args.max_rows and dataset.x_data.shape[0] > args.max_rows:
            sel = np.random.default_rng(7).choice(
                dataset.x_data.shape[0], args.max_rows, replace=False
            )
            dataset = GainDataset(dataset.x_data[sel], dataset.kk_data[sel])
            print(f"subsampled to {args.max_rows} rows (--max-rows)", flush=True)
    elif args.plant == "mujoco" and args.parallel_plants:
        from quattro_tpu.training import collect_gain_dataset_host_batched

        plants, substeps, measured = mujoco_plant_adapters_batched(
            args.system, args.parallel_plants
        )
        print(f"collecting (mujoco plant, {args.parallel_plants} lockstep lanes): "
              f"{args.num_inits} inits x {args.sim_steps} MPC steps x <= "
              f"{args.max_iter} iLQR iters (horizon {horizon})", flush=True)
        if measured is not None:
            # Parameter-match the solver's model to the compiled MuJoCo plant
            # (quadrotor_wrapper.py:76-83 semantics).
            from quattro_tpu.systems import make_discrete, quadrotor_dynamics

            dyn = make_discrete(
                lambda x, u: quadrotor_dynamics(x, u, measured), 0.01, "rk4"
            )
        policy = None
        if args.dagger_checkpoint:
            import jax as _jax
            import jax.numpy as _jnp

            from quattro_tpu.solver import hybrid_ilqr_solve

            dag_pred = GainPredictor.load(args.dagger_checkpoint)
            if args.system == "quadrotor":
                x_ref_pol = _jnp.zeros(12).at[2].set(0.5)
                offset_pol = _jnp.zeros(12).at[2].set(0.5)
            else:
                x_ref_pol = _jnp.zeros(4)
                offset_pol = _jnp.zeros(4)
            # Deployment-matched RAW hybrid policy (exact_fallback=False,
            # deployment tol/max_iter): its closed-loop visitation is the
            # distribution we want labeled.
            pol_cfg = ILQRConfig(tol=tol, max_iter=100)

            def one_policy(x, u):
                return hybrid_ilqr_solve(
                    dyn, cost, fcost, dag_pred.predict_fn(), dag_pred.prompt_len,
                    x, u, x_ref_pol, pol_cfg, state_offset=offset_pol,
                    exact_fallback=False,
                )

            def policy(xb, uwb):
                from quattro_tpu.control.mpc import shift_warm_start

                sol = _jax.vmap(one_policy)(xb, uwb)
                return sol.u_seq[:, 0], _jax.vmap(shift_warm_start)(sol.u_seq)

            print(f"DAgger policy: RAW hybrid from {args.dagger_checkpoint}",
                  flush=True)
        dataset = collect_gain_dataset_host_batched(
            plants, dyn, cost, fcost, x0s, horizon, m, args.sim_steps,
            config=solve_config, substeps=substeps,
            compact_iters=args.compact_iters or 3,
            shard_path=args.dataset_out
            if args.dataset_out and args.dataset_out.endswith(".qtshard") else None,
            policy=policy,
            verbose=True,
        )
    elif args.plant == "mujoco":
        from quattro_tpu.training import collect_gain_dataset_host

        reset_fn, read_fn, apply_fn, step_fn, substeps, measured = mujoco_plant_adapters(
            args.system
        )
        print(f"collecting (mujoco plant): {args.num_inits} inits x {args.sim_steps} "
              f"MPC steps x <= {args.max_iter} iLQR iters (horizon {horizon})", flush=True)
        if measured is not None:
            # Parameter-match the solver's model to the compiled MuJoCo plant
            # (quadrotor_wrapper.py:76-83 semantics).
            from quattro_tpu.systems import make_discrete, quadrotor_dynamics

            dyn = make_discrete(
                lambda x, u: quadrotor_dynamics(x, u, measured), 0.01, "rk4"
            )
        dataset = collect_gain_dataset_host(
            reset_fn, read_fn, apply_fn, step_fn, dyn, cost, fcost,
            x0s, horizon, m, args.sim_steps, config=solve_config,
            substeps=substeps, shard_path=args.dataset_out
            if args.dataset_out and args.dataset_out.endswith(".qtshard") else None,
            verbose=True,
        )
    elif args.plant == "randomized":
        from quattro_tpu.systems import (
            CartPoleParams,
            QuadrotorParams,
            cartpole_dynamics,
            quadrotor_dynamics,
            rk4_step,
        )
        from quattro_tpu.training import perturb_params

        cont = cartpole_dynamics if args.system == "cartpole" else quadrotor_dynamics
        if args.system == "cartpole":
            nominal = CartPoleParams()
        else:
            nominal = quad_center if quad_center is not None else QuadrotorParams()

        def plant(x, u, theta):
            return rk4_step(lambda xx, uu: cont(xx, uu, theta), x, u, 0.01)

        theta_batch = perturb_params(
            jax.random.PRNGKey(7), nominal, args.plant_rel, args.num_inits
        )
        print(f"collecting (randomized plant, rel={args.plant_rel}): {args.num_inits} "
              f"inits x {args.sim_steps} MPC steps x <= {args.max_iter} iLQR iters "
              f"(horizon {horizon})", flush=True)
        dataset = collect_gain_dataset(
            dyn, cost, fcost, x0s, horizon, m, args.sim_steps, config=solve_config,
            plant_dynamics=plant, plant_params_batch=theta_batch,
            compact_iters=args.compact_iters,
            device_resident=args.device_resident, verbose=True,
        )
    else:
        print(f"collecting (model plant): {args.num_inits} inits x {args.sim_steps} "
              f"MPC steps x <= {args.max_iter} iLQR iters (horizon {horizon})", flush=True)
        dataset = collect_gain_dataset(
            dyn, cost, fcost, x0s, horizon, m, args.sim_steps, config=solve_config,
            compact_iters=args.compact_iters,
            device_resident=args.device_resident, verbose=True,
        )
    print(f"collected {dataset.x_data.shape[0]} rows in {time.time() - t0:.1f}s", flush=True)
    stats = getattr(dataset, "stats", None)
    if stats is not None:
        print(f"row accounting: kept {stats.rows_kept}/{stats.rows_valid} valid "
              f"(dropped fraction {stats.dropped_fraction:.4f})", flush=True)
        if stats.dropped_fraction > 0.01:
            print("WARNING: >1% of valid rows dropped by the compaction cap — "
                  "raise --compact-iters (data is skewed toward easy steps)",
                  flush=True)
    if args.dataset_out and not args.dataset_in and not (
            args.plant == "mujoco" and args.dataset_out.endswith(".qtshard")):
        from quattro_tpu.training import save_gain_dataset

        save_gain_dataset(args.dataset_out, dataset)

    if args.epochs == 0:
        print("epochs=0: collection-only run, skipping training", flush=True)
        return

    # Every host dataset passes the finite-row filter before normalization/
    # training — a single-invocation DAgger run (--parallel-plants
    # --dagger-checkpoint without --dataset-in) trains on the freshly
    # collected rows, which can include diverged-lane labels.
    dataset = _drop_nonfinite_rows(dataset)

    # 80/20 split, shuffled with a fixed seed (transformer_training.py:45-56).
    if args.device_resident and isinstance(dataset, GainDataset):
        # Batched-mujoco rows land on host: split host-side (no 2x HBM gather
        # peak), then upload each split once in the flat low-padding layout.
        from quattro_tpu.training import DeviceGainDataset

        rng = np.random.default_rng(42)
        perm = rng.permutation(dataset.x_data.shape[0])
        split = int(len(perm) * 0.8)
        train = DeviceGainDataset.from_host(
            GainDataset(dataset.x_data[perm[:split]], dataset.kk_data[perm[:split]])
        )
        test = DeviceGainDataset.from_host(
            GainDataset(dataset.x_data[perm[split:]], dataset.kk_data[perm[split:]])
        )
    elif args.device_resident:
        train, test = dataset.split(0.8, seed=42)
    else:
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
        state_stride=args.state_stride,
    )
    print(f"training {predictor.num_params():,}-param model "
          f"({args.epochs} epochs, batch {args.batch_size})", flush=True)
    t0 = time.time()
    result = train_gain_predictor(
        predictor, train, test,
        TrainConfig(num_epochs=args.epochs, batch_size=args.batch_size,
                    learning_rate=args.learning_rate, patience=args.patience,
                    lr_schedule=args.lr_schedule,
                    checkpoint_dir=args.checkpoint_dir, verbose=True),
    )
    print(f"trained in {time.time() - t0:.1f}s", flush=True)

    result.predictor.save(args.out)
    print(json.dumps({
        "rows": int(dataset.x_data.shape[0]),
        "dropped_fraction": (stats.dropped_fraction if stats is not None else None),
        "params": int(result.predictor.num_params()),
        "final_train_loss": float(result.train_loss_history[-1]) if len(result.train_loss_history) else None,
        "final_test_loss": float(result.test_loss_history[-1]) if len(result.test_loss_history) else None,
        "checkpoint": args.out,
    }))


if __name__ == "__main__":
    main()
