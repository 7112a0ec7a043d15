"""End-to-end training pipeline: on-device collection -> optax fit -> hybrid solve.

Small-scale mirror of the reference pipeline (SURVEY.md §3.4-3.5): pure-iLQR
MPC sweeps generate per-iteration gain rows; the transformer fits the
(prompt tail -> head) mapping; the trained predictor drops into the hybrid
solver.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.models import GainPredictor
from quattro_tpu.solver import (
    ILQRConfig,
    hybrid_ilqr_solve,
    make_quadratic_cost,
    make_quadratic_final_cost,
)
from quattro_tpu.systems import cartpole_dynamics, make_discrete
from quattro_tpu.training import (
    GainDataset,
    TrainConfig,
    collect_gain_dataset,
    lhs_initial_states,
    train_gain_predictor,
)

HORIZON = 12
PROMPT = 3


@pytest.fixture(scope="module")
def problem():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    return dyn, cost, fcost


@pytest.fixture(scope="module")
def dataset(problem):
    dyn, cost, fcost = problem
    key = jax.random.PRNGKey(0)
    x0s = jnp.concatenate(
        [
            0.3 * jax.random.normal(key, (6, 1)),  # positions
            jnp.zeros((6, 1)),
            0.3 * jax.random.normal(jax.random.PRNGKey(1), (6, 1)),  # angles
            jnp.zeros((6, 1)),
        ],
        axis=1,
    )
    return collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=10,
        config=ILQRConfig(tol=1e-1, max_iter=8),
    )


def test_lhs_initial_states_covers_bounds():
    lower = jnp.array([-1.0, 0.0])
    upper = jnp.array([1.0, 2.0])
    samples = lhs_initial_states(jax.random.PRNGKey(0), lower, upper, 64)
    assert samples.shape == (64, 2)
    s = np.asarray(samples)
    assert (s >= np.asarray(lower)).all() and (s < np.asarray(upper)).all()
    # Latin hypercube: each of the 64 per-dimension bins hit exactly once.
    for d in range(2):
        bins = np.floor((s[:, d] - float(lower[d])) / float(upper[d] - lower[d]) * 64)
        assert len(np.unique(bins)) == 64


def test_collection_shapes_and_content(dataset):
    n_rows = dataset.x_data.shape[0]
    assert n_rows > 10  # several iterations per control step per initial state
    assert dataset.x_data.shape[1:] == (HORIZON + 1, 4)
    assert dataset.kk_data.shape[1:] == (HORIZON, 1 * (1 + 4))
    assert np.isfinite(dataset.x_data).all() and np.isfinite(dataset.kk_data).all()


def test_chunked_collection_matches_full_batch(problem, dataset):
    """chunk_size splits the sweep without changing the rows (memory-bounded
    collection for reference max_iter=100 settings)."""
    dyn, cost, fcost = problem
    key = jax.random.PRNGKey(0)
    x0s = jnp.concatenate(
        [
            0.3 * jax.random.normal(key, (6, 1)),
            jnp.zeros((6, 1)),
            0.3 * jax.random.normal(jax.random.PRNGKey(1), (6, 1)),
            jnp.zeros((6, 1)),
        ],
        axis=1,
    )
    chunked = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=10,
        config=ILQRConfig(tol=1e-1, max_iter=8), chunk_size=2,
    )
    np.testing.assert_allclose(chunked.x_data, dataset.x_data, rtol=0, atol=0)
    np.testing.assert_allclose(chunked.kk_data, dataset.kk_data, rtol=0, atol=0)


def test_compacted_collection_matches_full_batch(problem, dataset):
    """compact_iters gathers valid rows on device (transfer-bounded
    collection for tunnel-attached TPUs); with a generous cap the rows must
    equal the host-filtered path exactly."""
    dyn, cost, fcost = problem
    key = jax.random.PRNGKey(0)
    x0s = jnp.concatenate(
        [
            0.3 * jax.random.normal(key, (6, 1)),
            jnp.zeros((6, 1)),
            0.3 * jax.random.normal(jax.random.PRNGKey(1), (6, 1)),
            jnp.zeros((6, 1)),
        ],
        axis=1,
    )
    compacted = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=10,
        config=ILQRConfig(tol=1e-1, max_iter=8), compact_iters=8,
    )
    np.testing.assert_allclose(compacted.x_data, dataset.x_data, rtol=0, atol=0)
    np.testing.assert_allclose(compacted.kk_data, dataset.kk_data, rtol=0, atol=0)


def test_randomized_plant_collection(problem):
    """Domain-randomized on-device collection: per-trajectory perturbed plant
    params change the closed-loop data (the on-device counterpart of the
    reference's MuJoCo model-mismatch distribution,
    training_data_collection.py:78-88)."""
    from quattro_tpu.systems import CartPoleParams, rk4_step, cartpole_dynamics
    from quattro_tpu.training import perturb_params

    dyn, cost, fcost = problem
    x0s = jnp.tile(jnp.array([[0.2, 0.0, 0.3, 0.0]], dtype=jnp.float32), (4, 1))
    theta = perturb_params(jax.random.PRNGKey(3), CartPoleParams(), 0.2, 4)
    # Every leaf batched over the 4 trajectories, perturbed within ±20%.
    assert all(leaf.shape[0] == 4 for leaf in jax.tree_util.tree_leaves(theta))
    nominal = jnp.asarray(CartPoleParams().m_cart)
    assert np.all(np.abs(np.asarray(theta.m_cart) / nominal - 1.0) <= 0.2)

    def plant(x, u, p):
        return rk4_step(lambda xx, uu: cartpole_dynamics(xx, uu, p), x, u, 0.01)

    cfg = ILQRConfig(tol=1e-1, max_iter=4)
    randomized = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=4, config=cfg,
        plant_dynamics=plant, plant_params_batch=theta,
    )
    nominal_ds = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=4, config=cfg,
    )
    assert randomized.x_data.shape[1:] == (HORIZON + 1, 4)
    assert np.isfinite(randomized.x_data).all()
    # Identical x0 rows: with per-trajectory plants the data must differ
    # from the nominal-plant sweep (row counts may differ too — the valid
    # masks depend on the closed-loop path).
    same_shape = randomized.x_data.shape == nominal_ds.x_data.shape
    assert (not same_shape) or (not np.allclose(randomized.x_data, nominal_ds.x_data))

    with pytest.raises(ValueError):
        collect_gain_dataset(
            dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=2, config=cfg,
            plant_params_batch=theta,
        )


def test_train_and_hybrid_solve(problem, dataset):
    dyn, cost, fcost = problem
    n_rows = dataset.x_data.shape[0]
    split = int(n_rows * 0.8)
    train = GainDataset(dataset.x_data[:split], dataset.kk_data[:split])
    test = GainDataset(dataset.x_data[split:], dataset.kk_data[split:])

    predictor = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=32, nhead=4, num_decoder_layers=1, dim_feedforward=64,
        max_seq_len=64, seq_len_states=HORIZON + 1,
    )
    result = train_gain_predictor(
        predictor, train, test, TrainConfig(num_epochs=12, batch_size=16, learning_rate=1e-3)
    )
    assert result.train_loss_history[-1] < result.train_loss_history[0] * 0.8, (
        "training loss did not decrease",
        result.train_loss_history,
    )

    # The trained predictor drives a hybrid solve without blowing up.
    sol = hybrid_ilqr_solve(
        dyn, cost, fcost, result.predictor.predict_fn(), PROMPT,
        jnp.array([0.1, 0.0, 0.15, 0.0]), jnp.zeros((HORIZON, 1)), jnp.zeros(4),
        ILQRConfig(tol=1e-1, max_iter=15),
    )
    assert np.isfinite(float(sol.cost))
    # Hybrid solve should still reduce cost vs the zero-control rollout.
    from quattro_tpu.solver import simulate, trajectory_cost

    x_open = simulate(dyn, jnp.array([0.1, 0.0, 0.15, 0.0]), jnp.zeros((HORIZON, 1)))
    open_cost = trajectory_cost(cost, fcost, x_open, jnp.zeros((HORIZON, 1)))
    assert float(sol.cost) < float(open_cost)


def test_predictor_checkpoint_roundtrip_after_training(problem, dataset, tmp_path):
    predictor = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=16, nhead=2, num_decoder_layers=1, dim_feedforward=32,
        max_seq_len=64, seq_len_states=HORIZON + 1,
    )
    result = train_gain_predictor(
        predictor,
        GainDataset(dataset.x_data, dataset.kk_data),
        None,
        TrainConfig(num_epochs=2, batch_size=16),
    )
    path = str(tmp_path / "trained.npz")
    result.predictor.save(path)
    loaded = GainPredictor.load(path)
    x = jnp.asarray(dataset.x_data[0])
    kk = jnp.asarray(dataset.kk_data[0])
    np.testing.assert_allclose(
        np.asarray(result.predictor.predict_fn()(x, kk)),
        np.asarray(loaded.predict_fn()(x, kk)),
        rtol=1e-6,
    )


def test_checkpoint_resume(problem, dataset, tmp_path):
    """Orbax mid-training resume: a run interrupted at epoch 4 and resumed
    reaches the same final params as the checkpoint-free run cannot be
    asserted bit-exactly (RNG stream restarts at the resume epoch), but
    resume must (a) restore the saved step and (b) keep improving."""
    ckpt_dir = str(tmp_path / "ckpts")
    predictor = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=16, nhead=2, num_decoder_layers=1, dim_feedforward=32,
        max_seq_len=64, seq_len_states=HORIZON + 1,
    )
    data = GainDataset(dataset.x_data, dataset.kk_data)
    # Phase 1: 4 epochs, checkpoint every 2.
    r1 = train_gain_predictor(
        predictor, data, None,
        TrainConfig(num_epochs=4, batch_size=16, checkpoint_dir=ckpt_dir, checkpoint_every=2),
    )
    # Phase 2: "restart" from scratch-params but same dir with a higher epoch
    # budget -> resumes from epoch 4, trains 4 more.
    r2 = train_gain_predictor(
        predictor, data, None,
        TrainConfig(num_epochs=8, batch_size=16, checkpoint_dir=ckpt_dir, checkpoint_every=2),
    )
    assert len(r2.train_loss_history) == 4, "resume should only run the remaining epochs"
    assert r2.train_loss_history[-1] < r1.train_loss_history[0]


def test_shipped_checkpoints_stabilize_closed_loop():
    """The in-repo trained checkpoints must drive the hybrid MPC (factory
    defaults, exact_fallback on) to the target in closed loop — checkpoints
    are artifacts, so this is the shipping bar (a checkpoint that only fits
    its training distribution is not a controller)."""
    import jax.numpy as jnp

    from quattro_tpu.control import make_cartpole_mpc, make_quadrotor_mpc
    from quattro_tpu.models import GainPredictor
    from quattro_tpu.systems import cartpole_dynamics, make_discrete, quadrotor_dynamics

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "checkpoints")

    pred = GainPredictor.load(os.path.join(root, "quadrotor_gain.npz"))
    ctrl = make_quadrotor_mpc(
        mode="hybrid", predict_fn=pred.predict_fn(), prompt_len=pred.prompt_len
    )
    plant = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    x = jnp.zeros(12).at[2].set(0.2).at[6].set(0.15)
    x_ref = jnp.zeros(12).at[2].set(0.5)
    state = ctrl.init_state(dtype=x.dtype)
    for _ in range(300):
        out = ctrl.step(x, state)
        u, state = out[0], out[-1]
        x = plant(x, u[0] if u.ndim == 2 else u)
    assert float(jnp.linalg.norm(x - x_ref)) < 0.05

    pred = GainPredictor.load(os.path.join(root, "cartpole_gain.npz"))
    ctrl = make_cartpole_mpc(
        mode="hybrid", predict_fn=pred.predict_fn(), prompt_len=pred.prompt_len
    )
    plant = make_discrete(cartpole_dynamics, 0.01, "rk4")
    x = jnp.array([0.15, 0.0, 0.2, 0.0])
    state = ctrl.init_state(dtype=x.dtype)
    for _ in range(700):
        out = ctrl.step(x, state)
        u, state = out[0], out[-1]
        x = plant(x, u[0] if u.ndim == 2 else u)
    assert float(jnp.linalg.norm(x)) < 0.05


def _small_predictor():
    return GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=32, nhead=4, num_decoder_layers=1, dim_feedforward=64,
        max_seq_len=64, seq_len_states=HORIZON + 1,
    )


def test_dp_mesh_training_matches_single_device(dataset):
    """Mesh-sharded data-parallel training (batch over 'traj', params
    replicated) must reproduce the single-device loss trajectory — same
    permutations, same dropout keys, only the GSPMD gradient reduction order
    differs (VERDICT r1 weak #9: dp existed only in the dryrun)."""
    from quattro_tpu.parallel import make_mesh

    predictor = _small_predictor()
    cfg = TrainConfig(num_epochs=3, batch_size=8, learning_rate=1e-3)
    single = train_gain_predictor(predictor, dataset, None, cfg)
    mesh = make_mesh((8,), ("traj",))
    dp = train_gain_predictor(predictor, dataset, None, cfg, mesh=mesh)
    np.testing.assert_allclose(
        dp.train_loss_history, single.train_loss_history, rtol=1e-5
    )
    # And the trained params agree across implementations.
    flat_s = jax.tree.leaves(single.predictor.params)
    flat_d = jax.tree.leaves(dp.predictor.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_mesh_batch_divisibility_validated(dataset):
    from quattro_tpu.parallel import make_mesh

    mesh = make_mesh((8,), ("traj",))
    with pytest.raises(ValueError):
        train_gain_predictor(
            _small_predictor(), dataset, None,
            TrainConfig(num_epochs=1, batch_size=6), mesh=mesh,
        )
    # The EFFECTIVE batch is validated too: with fewer rows than batch_size
    # the single per-epoch batch is the whole dataset, whose width must also
    # divide the mesh axis (it would otherwise fail inside device_put).
    small = type(dataset)(*(f[:5] for f in dataset))  # 5 rows, 5 % 8 != 0
    with pytest.raises(ValueError, match="effective batch"):
        train_gain_predictor(
            _small_predictor(), small, None,
            TrainConfig(num_epochs=1, batch_size=64), mesh=mesh,
        )


def test_streamed_shard_training(dataset, tmp_path):
    """ShardDataset: row gathers and streaming stats match the in-memory
    dataset, and the trainer runs end-to-end from the stream."""
    from quattro_tpu.training import ShardDataset, save_gain_dataset

    path = save_gain_dataset(str(tmp_path / "d.qtshard"), dataset, rows_per_record=7)
    sd = ShardDataset(path)
    try:
        assert len(sd) == dataset.x_data.shape[0]

        idx = np.random.default_rng(0).choice(len(sd), size=5, replace=False)
        xg, kg = sd.gather(idx)
        np.testing.assert_allclose(xg, np.asarray(dataset.x_data)[idx])
        np.testing.assert_allclose(kg, np.asarray(dataset.kk_data)[idx])

        xm, xs_, km, ks_ = sd.feature_stats()
        np.testing.assert_allclose(xm, np.asarray(dataset.x_data).mean((0, 1)), rtol=1e-6)
        np.testing.assert_allclose(km, np.asarray(dataset.kk_data).mean((0, 1)), rtol=1e-6)

        res = train_gain_predictor(
            _small_predictor(), sd, sd, TrainConfig(num_epochs=2, batch_size=8)
        )
        assert res.train_loss_history.shape[0] == 2
        assert np.isfinite(res.train_loss_history).all()
        assert np.isfinite(res.test_loss_history).all()
    finally:
        sd.close()


def test_state_stride_roundtrip_and_training(dataset, tmp_path):
    """state_stride: context subsampling for long horizons — training
    consumes strided contexts, predict_fn strides at inference, and the
    stride survives the checkpoint roundtrip."""
    predictor = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=32, nhead=4, num_decoder_layers=1, dim_feedforward=64,
        max_seq_len=64, seq_len_states=HORIZON + 1, state_stride=3,
    )
    res = train_gain_predictor(
        predictor, dataset, None, TrainConfig(num_epochs=2, batch_size=8)
    )
    out = res.predictor.predict(
        np.zeros((HORIZON + 1, 4), np.float32), np.zeros((HORIZON, 5), np.float32)
    )
    assert out.shape == (HORIZON - PROMPT, 5)

    path = str(tmp_path / "strided.npz")
    res.predictor.save(path)
    loaded = GainPredictor.load(path)
    assert loaded.state_stride == 3
    out2 = loaded.predict(
        np.zeros((HORIZON + 1, 4), np.float32), np.zeros((HORIZON, 5), np.float32)
    )
    np.testing.assert_allclose(out2, out, rtol=1e-6)


def test_device_resident_collection_and_scanned_training(problem, dataset):
    """HBM-resident pipeline (tunnel-attached TPU path): collection returns
    device arrays identical to the host-compacted rows, and the scanned-epoch
    trainer (one dispatch per epoch) learns on them."""
    from quattro_tpu.training import DeviceGainDataset

    dyn, cost, fcost = problem
    key = jax.random.PRNGKey(0)
    x0s = jnp.concatenate(
        [
            0.3 * jax.random.normal(key, (6, 1)),
            jnp.zeros((6, 1)),
            0.3 * jax.random.normal(jax.random.PRNGKey(1), (6, 1)),
            jnp.zeros((6, 1)),
        ],
        axis=1,
    )
    dev = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=10,
        config=ILQRConfig(tol=1e-1, max_iter=8), compact_iters=8,
        device_resident=True,
    )
    assert isinstance(dev, DeviceGainDataset)
    assert isinstance(dev.x_data, jax.Array)
    # Same rows as the host path (module `dataset` fixture), bit-exact.
    np.testing.assert_array_equal(np.asarray(dev.x_data), dataset.x_data)
    np.testing.assert_array_equal(np.asarray(dev.kk_data), dataset.kk_data)

    # device_resident requires the on-device compaction.
    with pytest.raises(ValueError):
        collect_gain_dataset(
            dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=10,
            config=ILQRConfig(tol=1e-1, max_iter=8), device_resident=True,
        )

    train, test = dev.split(0.8, seed=42)
    assert len(train) + len(test) == len(dev)
    predictor = GainPredictor.create(
        state_dim=4, control_dim=5, prompt_len=PROMPT, target_len=HORIZON - PROMPT,
        d_model=32, nhead=4, num_decoder_layers=1, dim_feedforward=64,
        max_seq_len=64, seq_len_states=HORIZON + 1,
    )
    result = train_gain_predictor(
        predictor, train, test,
        TrainConfig(num_epochs=12, batch_size=16, learning_rate=1e-3),
    )
    assert result.train_loss_history[-1] < result.train_loss_history[0] * 0.8, (
        "scanned-epoch training loss did not decrease",
        result.train_loss_history,
    )
    assert len(result.test_loss_history) > 0

    # The trained predictor drives a hybrid solve to a finite cost.
    sol = hybrid_ilqr_solve(
        dyn, cost, fcost, result.predictor.predict_fn(), PROMPT,
        jnp.array([0.1, 0.0, 0.15, 0.0]), jnp.zeros((HORIZON, 1)), jnp.zeros(4),
        ILQRConfig(tol=1e-1, max_iter=15),
    )
    assert np.isfinite(float(sol.cost))

    # mesh= is the dp path's knob; the device-resident path must refuse it.
    from quattro_tpu.parallel import make_mesh

    with pytest.raises(ValueError):
        train_gain_predictor(
            predictor, train, test,
            TrainConfig(num_epochs=1, batch_size=16),
            mesh=make_mesh((2, 1)),
        )


def _model_plant_adapter(dyn):
    """Host plant adapter driven by the solver's own discrete dynamics —
    exercises the collect_gain_dataset_host* plant protocol without MuJoCo."""
    state = {"x": None, "u": None}

    def reset(x0):
        state["x"] = np.asarray(x0, dtype=np.float32)

    def read():
        return state["x"]

    def apply(u):
        state["u"] = np.asarray(u, dtype=np.float32)

    def step():
        state["x"] = np.asarray(
            dyn(jnp.asarray(state["x"]), jnp.asarray(state["u"])), dtype=np.float32
        )

    return reset, read, apply, step


def _flat_rows(x_data, kk_data):
    return np.concatenate(
        [np.asarray(x_data).reshape(len(x_data), -1),
         np.asarray(kk_data).reshape(len(kk_data), -1)], axis=1,
    )


def _assert_rows_match(a, b, atol):
    """Each row of ``a`` pairs 1:1 with a distinct row of ``b`` within atol.

    Set comparison with float slack: the vmapped and single-solve paths fuse
    differently under XLA, so rows agree only to float32 noise — too loose
    for bit-sorting, far tighter than the spacing between distinct rows."""
    assert a.shape == b.shape
    used = np.zeros(len(b), dtype=bool)
    for i, row in enumerate(a):
        d = (np.abs(b - row) / (1.0 + np.abs(row))).max(axis=1)
        d[used] = np.inf
        j = int(np.argmin(d))
        assert d[j] < atol, (i, j, d[j])
        used[j] = True


def test_batched_host_collection_matches_sequential(problem):
    """The lockstep P-plant collector produces the same row SET as the
    sequential host loop (order differs: (step, plant, iter) vs per-run), and
    its stats account for every valid row."""
    from quattro_tpu.training import (
        collect_gain_dataset_host,
        collect_gain_dataset_host_batched,
    )

    dyn, cost, fcost = problem
    x0s = np.array(
        [[0.2, 0.0, 0.2, 0.0], [-0.15, 0.0, -0.25, 0.0],
         [0.1, 0.0, -0.1, 0.0], [-0.05, 0.0, 0.3, 0.0]],
        dtype=np.float32,
    )
    # riccati="seq" on both sides: the vmapped and single-solve paths run the
    # identical backward form (only XLA-fusion float noise differs). tol ~ 0
    # pins every solve to exactly max_iter iterations — a finite tol sits on
    # an accept/converge boundary where float noise flips iteration counts
    # between the two paths and the row sets differ structurally.
    config = ILQRConfig(tol=1e-12, max_iter=3, riccati="seq")

    seq_parts = []
    for x0 in x0s:
        reset, read, apply, step = _model_plant_adapter(dyn)
        seq_parts.append(collect_gain_dataset_host(
            reset, read, apply, step, dyn, cost, fcost,
            x0[None], HORIZON, 1, sim_steps=3, config=config, substeps=2,
        ))
    seq_x = np.concatenate([p.x_data for p in seq_parts])
    seq_kk = np.concatenate([p.kk_data for p in seq_parts])

    plants = [_model_plant_adapter(dyn) for _ in range(2)]
    batched = collect_gain_dataset_host_batched(
        plants, dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=3,
        config=config, substeps=2, compact_iters=6,
    )

    assert batched.stats is not None
    assert batched.stats.rows_dropped == 0
    assert batched.stats.rows_kept == batched.x_data.shape[0] == seq_x.shape[0]
    _assert_rows_match(
        _flat_rows(batched.x_data, batched.kk_data),
        _flat_rows(seq_x, seq_kk),
        atol=1e-3,
    )

    # Lane count must divide the batch.
    with pytest.raises(ValueError):
        collect_gain_dataset_host_batched(
            [_model_plant_adapter(dyn) for _ in range(3)],
            dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=2, config=config,
        )


def test_batched_host_collection_cap_drop_accounting(problem):
    """A too-small compact cap drops rows and reports an honest fraction."""
    from quattro_tpu.training import collect_gain_dataset_host_batched

    dyn, cost, fcost = problem
    x0s = np.array(
        [[0.3, 0.0, 0.3, 0.0], [-0.3, 0.0, -0.3, 0.0]], dtype=np.float32
    )
    plants = [_model_plant_adapter(dyn) for _ in range(2)]
    ds = collect_gain_dataset_host_batched(
        plants, dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=4,
        config=ILQRConfig(tol=1e-3, max_iter=8, riccati="seq"),
        compact_iters=1,
    )
    cap = 2 * 4 * 1
    assert ds.x_data.shape[0] == cap
    assert ds.stats.rows_dropped == ds.stats.rows_valid - cap > 0
    assert 0.0 < ds.stats.dropped_fraction < 1.0


def test_device_dataset_from_host_roundtrip(dataset):
    """from_host uploads flat-layout rows that match the source bit-exactly."""
    from quattro_tpu.training import DeviceGainDataset

    dev = DeviceGainDataset.from_host(dataset)
    assert dev.x_flat.ndim == 2 and dev.kk_flat.ndim == 2
    np.testing.assert_array_equal(np.asarray(dev.x_data), dataset.x_data)
    np.testing.assert_array_equal(np.asarray(dev.kk_data), dataset.kk_data)
    assert dev.stats == dataset.stats


def test_batched_host_collection_with_policy(problem):
    """DAgger-style collection: the policy drives the plants (its controls
    hit the adapters), while rows are still labeled by the exact solver."""
    from quattro_tpu.training import collect_gain_dataset_host_batched

    dyn, cost, fcost = problem
    x0s = np.array([[0.2, 0.0, 0.2, 0.0], [-0.15, 0.0, -0.25, 0.0]], np.float32)
    applied = []

    def tracking_adapter():
        reset, read, apply, step = _model_plant_adapter(dyn)

        def apply_tracked(u):
            applied.append(np.asarray(u).copy())
            apply(u)

        return reset, read, apply_tracked, step

    const_u = 0.123

    def policy(xb, uwb):
        return jnp.full((xb.shape[0], 1), const_u), uwb

    plants = [tracking_adapter() for _ in range(2)]
    ds = collect_gain_dataset_host_batched(
        plants, dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=3,
        config=ILQRConfig(tol=1e-12, max_iter=2, riccati="seq"),
        compact_iters=2, policy=policy,
    )
    # Every applied control came from the policy, not the expert solve.
    assert len(applied) == 2 * 3
    assert all(abs(float(u[0]) - const_u) < 1e-6 for u in applied)
    # Rows are exact-solver labels over the policy-visited states: finite and
    # the full fixed iteration budget.
    assert ds.x_data.shape[0] == 2 * 3 * 2
    assert np.isfinite(ds.kk_data).all()


def test_compact_cap_beyond_capacity_clamps(problem):
    """compact_iters > max_iter: the device-resident cap clamps to the log
    capacity instead of crashing the gather+reshape inside jit."""
    dyn, cost, fcost = problem
    x0s = jnp.array([[0.2, 0.0, 0.3, 0.0], [0.1, 0.0, -0.2, 0.0]], jnp.float32)
    ds = collect_gain_dataset(
        dyn, cost, fcost, x0s, HORIZON, 1, sim_steps=3,
        config=ILQRConfig(tol=1e-1, max_iter=4),
        compact_iters=10, device_resident=True,
    )
    assert ds.stats.rows_dropped == 0
    assert ds.x_data.shape[0] == ds.stats.rows_kept
