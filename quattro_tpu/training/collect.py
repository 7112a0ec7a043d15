"""Batched on-device training-data collection.

Reference pipeline (SURVEY.md §3.4): a 10-process ``multiprocessing.Pool``
runs closed-loop MuJoCo sims with ``ilqr_only`` MPC, pickling per-iteration
solver logs; the trainer later reads rows of (x_seq, k_seq, K_seq)
(training_data_collection.py:303-318, transformer_training.py:9-42).

Here: one vmapped+jitted sweep of MPC rollouts on device. Every (initial
state, control step, iLQR iteration) triple yields a training row; the data
never leaves the accelerator until the final stacked arrays.

Token-count convention (SURVEY.md §7.7 flags the reference's train/infer
inconsistency): we store the FULL (H+1)-row state trajectory per row — exactly
what the hybrid solver feeds the model at inference
(quattro_ilqr_tf.py:504) — and H gain tokens; ``target_len`` is derived from
the horizon, not from the state-row count.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quattro_tpu.solver.ilqr import ILQRConfig, ilqr_solve_with_logs, pack_gain_tokens
from quattro_tpu.control.mpc import shift_warm_start


class GainDataset(NamedTuple):
    """Stacked training rows for the gain predictor."""

    x_data: np.ndarray  # (N, H+1, n) raw state trajectories (iteration start)
    kk_data: np.ndarray  # (N, H, m*(1+n)) packed gain tokens


def lhs_initial_states(
    key: jax.Array,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Latin-Hypercube sample of initial conditions.

    Replaces ``scipy.stats.qmc.LatinHypercube``
    (examples/quadrotor/training/training_data_collection.py:44-62) with a
    jax.random implementation: stratified one-point-per-bin sampling with
    independent per-dimension permutations.
    """
    dim = lower.shape[0]
    perm_keys = jax.random.split(key, dim + 1)
    bins = (jnp.arange(num_samples) + jax.random.uniform(perm_keys[0], (dim, num_samples))).T
    # bins[:, d] currently stratified in order; permute per dimension.
    cols = []
    for d in range(dim):
        perm = jax.random.permutation(perm_keys[d + 1], num_samples)
        cols.append(bins[perm, d] / num_samples)
    unit = jnp.stack(cols, axis=1)  # (num_samples, dim) in [0, 1)
    return lower + unit * (upper - lower)


def collect_gain_dataset(
    dynamics: Callable,
    cost: Callable,
    final_cost: Callable,
    x0_batch: jnp.ndarray,  # (B, n) initial plant states
    horizon: int,
    control_dim: int,
    sim_steps: int,
    config: ILQRConfig = ILQRConfig(),
    plant_dynamics: Optional[Callable] = None,
) -> GainDataset:
    """Closed-loop MPC sweeps that log every iLQR iteration as a training row.

    For each initial state: run ``sim_steps`` receding-horizon control steps
    (warm-started, first control applied to the plant — semantics of the
    reference's collection loop, training_data_collection.py:78-88) with the
    logging solver. ``plant_dynamics`` defaults to the solver's model (the
    reference uses MuJoCo as the plant; a distinct plant fn reproduces that
    model-mismatch capability).

    Returns host arrays with invalid (post-convergence) iterations filtered.
    """
    if plant_dynamics is None:
        plant_dynamics = dynamics

    solve = partial(ilqr_solve_with_logs, dynamics, cost, final_cost, config=config)

    def control_step(carry, _):
        x_plant, u_warm = carry
        sol, logs = solve(x_plant, u_warm)
        u_applied = sol.u_seq[0]
        x_next = plant_dynamics(x_plant, u_applied)
        return (x_next, shift_warm_start(sol.u_seq)), (logs.x_seq, logs.k_seq, logs.big_k_seq, logs.valid)

    def sweep(x0):
        u_warm = jnp.zeros((horizon, control_dim), dtype=x0.dtype)
        _, (x_log, k_log, big_k_log, valid) = jax.lax.scan(
            control_step, (x0, u_warm), None, length=sim_steps
        )
        return x_log, k_log, big_k_log, valid  # (sim_steps, max_iter, ...)

    x_log, k_log, big_k_log, valid = jax.jit(jax.vmap(sweep))(x0_batch)

    # Flatten (B, sim_steps, max_iter, ...) -> rows, filter valid on host.
    x_rows = np.asarray(x_log).reshape((-1,) + x_log.shape[3:])
    k_rows = np.asarray(k_log).reshape((-1,) + k_log.shape[3:])
    big_k_rows = np.asarray(big_k_log).reshape((-1,) + big_k_log.shape[3:])
    mask = np.asarray(valid).reshape(-1)

    kk = np.concatenate(
        [k_rows[mask, :, :], big_k_rows[mask].reshape(mask.sum(), horizon, -1)], axis=-1
    )
    return GainDataset(x_data=x_rows[mask], kk_data=kk)


def save_gain_dataset(path: str, dataset: GainDataset, rows_per_record: int = 1024) -> str:
    """Persist a dataset: ``.qtshard`` → native validated shard records
    (C++ framing, quattro_tpu.io), anything else → compressed npz.

    The shard path chunks rows into records so partially-written collection
    jobs stay loadable up to the last complete chunk (the reference bounded
    loss the same way with periodic pickle flushes,
    training_data_collection.py:197-202).
    """
    if path.endswith(".qtshard"):
        from quattro_tpu.io import ShardWriter

        with ShardWriter(path) as w:
            for i in range(0, dataset.x_data.shape[0], rows_per_record):
                w.append({
                    "x_data": np.asarray(dataset.x_data[i:i + rows_per_record]),
                    "kk_data": np.asarray(dataset.kk_data[i:i + rows_per_record]),
                })
    else:
        np.savez_compressed(path, x_data=np.asarray(dataset.x_data),
                            kk_data=np.asarray(dataset.kk_data))
    return path


def load_gain_dataset(paths) -> GainDataset:
    """Load + concatenate dataset files (npz and/or qtshard, mixed OK)."""
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    xs, ks = [], []
    for p in paths:
        if str(p).endswith(".qtshard"):
            from quattro_tpu.io import ShardReader

            with ShardReader(str(p)) as r:
                for rec in r:
                    xs.append(np.array(rec["x_data"]))
                    ks.append(np.array(rec["kk_data"]))
        else:
            with np.load(p) as data:
                xs.append(data["x_data"])
                ks.append(data["kk_data"])
    return GainDataset(np.concatenate(xs, axis=0), np.concatenate(ks, axis=0))
