"""Utils tests: timing, metrics, dataset shards."""

import numpy as np

from quattro_tpu.utils.metrics import (
    JsonlLogger,
    load_dataset_shards,
    save_dataset_shard,
    solver_log_summary,
)
from quattro_tpu.utils.timing import PhaseTimer, block_nnz_per_sec


def test_phase_timer(tmp_path):
    timer = PhaseTimer()
    with timer.phase("a"):
        sum(range(1000))
    with timer.phase("a"):
        sum(range(1000))
    s = timer.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] > 0
    timer.reset()
    assert timer.summary() == {}


def test_jsonl_logger_roundtrip(tmp_path):
    logger = JsonlLogger(str(tmp_path / "m.jsonl"))
    logger.log({"step": 1, "cost": np.float32(2.5), "vec": np.arange(3)})
    logger.log({"step": 2, "cost": 1.0})
    records = logger.read()
    assert len(records) == 2
    assert records[0]["cost"] == 2.5
    assert records[0]["vec"] == [0, 1, 2]


def test_dataset_shards_roundtrip(tmp_path):
    x1, k1 = np.ones((3, 5, 4)), np.zeros((3, 5, 5))
    x2, k2 = 2 * np.ones((2, 5, 4)), np.ones((2, 5, 5))
    p1 = save_dataset_shard(str(tmp_path / "shard.npz"), x1, k1, shard_index=0)
    p2 = save_dataset_shard(str(tmp_path / "shard.npz"), x2, k2, shard_index=1)
    x, k = load_dataset_shards([p1, p2])
    assert x.shape == (5, 5, 4) and k.shape == (5, 5, 5)
    np.testing.assert_array_equal(x[:3], x1)
    np.testing.assert_array_equal(x[3:], x2)


def test_solver_log_summary():
    import jax.numpy as jnp

    from quattro_tpu.solver import ILQRConfig, ilqr_solve_with_logs, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    _, logs = ilqr_solve_with_logs(
        dyn, cost, fcost, jnp.array([0.1, 0.0, 0.2, 0.0]), jnp.zeros((20, 1)),
        ILQRConfig(tol=1e-1, max_iter=10),
    )
    summary = solver_log_summary(logs)
    assert summary["iterations"] >= 1
    assert len(summary["cost"]) == summary["iterations"]
    assert all(a in (1.0, 0.5, 0.25, 0.1, 0.05, 0.01, 0.0) for a in summary["alpha"])


def test_block_nnz_per_sec():
    assert block_nnz_per_sec(10, 1.0) == 28.0


def test_nan_guard():
    import jax
    import jax.numpy as jnp
    import pytest

    from quattro_tpu.utils.debug import nan_guard

    with pytest.raises(FloatingPointError):
        with nan_guard():
            jnp.log(jnp.array(-1.0)).block_until_ready()
    # Guard restored afterwards: NaN passes silently again.
    assert bool(jnp.isnan(jnp.log(jnp.array(-1.0))))


def test_verify_halo_exchange():
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec

    from quattro_tpu.parallel import make_mesh
    from quattro_tpu.utils.debug import verify_halo_exchange

    mesh = make_mesh((1, 8))
    num = 8
    perm = [(i, (i - 1) % num) for i in range(num)]

    def body(x):
        received = jax.lax.ppermute(x, "horizon", perm)
        diff = verify_halo_exchange(x, received, "horizon", perm)
        return diff[None]

    x = jnp.arange(8.0 * 4).reshape(8, 4)
    diffs = shard_map(
        body, mesh=mesh, in_specs=PartitionSpec("horizon"), out_specs=PartitionSpec("horizon")
    )(x)
    assert float(jnp.max(diffs)) == 0.0
