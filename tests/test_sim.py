"""MuJoCo validation-harness tests (closed loop with real model mismatch).

These are the "closed-loop simulation as integration test" capability the
reference relies on (SURVEY.md §4) made into actual automated tests.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

from quattro_tpu.control import make_cartpole_mpc, make_quadrotor_mpc
from quattro_tpu.sim import CartPoleBridge, QuadrotorBridge, euler_to_quat, quat_to_rpy


def test_quat_rpy_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        rpy = rng.uniform(-1.0, 1.0, size=3)
        quat = euler_to_quat(*rpy)
        back = quat_to_rpy(*quat)
        np.testing.assert_allclose(back, rpy, atol=1e-10)


def test_cartpole_bridge_stabilizes():
    """Solver model (1 kg / 0.1 kg) stabilizes the mismatched MuJoCo plant
    (~8 kg cart, ~4.2 kg pole) through the gear-50 negated actuator — the
    reference demo's defining behavior."""
    controller = make_cartpole_mpc(horizon=30)
    state = controller.init_state()
    plant = CartPoleBridge()
    plant.reset(position=0.0, angle=0.3)

    for _ in range(500):
        x = plant.read_state()
        u, _, state = controller.step(jnp.asarray(x, dtype=jnp.float32), state)
        plant.apply_control(float(np.asarray(u)[0]))
        plant.step()

    final = plant.read_state()
    assert np.linalg.norm(final) < 0.1, f"did not stabilize: {final}"


def test_quadrotor_bridge_sensor_accessors():
    """IMU readers (gyro/accel/quat) — parity with quadrotor_wrapper.py:107-130.

    After mj_forward at rest, the body-frame quat sensor must agree with the
    free-joint quaternion and the accelerometer must read ~ +g on its z axis
    (reaction to gravity); gyro reads the zero body rates."""
    plant = QuadrotorBridge()
    rpy = (0.12, -0.08, 0.3)
    plant.reset(position=(0.0, 0.0, 0.5), rpy=rpy)
    mujoco.mj_forward(plant.model, plant.data)

    sensors = plant.read_sensors()
    assert set(sensors) == {"gyro", "accel", "quat"}
    quat = sensors["quat"] * np.sign(sensors["quat"][0])
    np.testing.assert_allclose(quat, euler_to_quat(*rpy), atol=1e-9)
    np.testing.assert_allclose(sensors["gyro"], 0.0, atol=1e-12)
    # A free-floating body with zero thrust is in free fall: the accelerometer
    # (specific force) reads ~0 there.
    assert np.linalg.norm(sensors["accel"]) < 1e-9

    # Under ~hover thrust the rotors support the weight: specific force ~= g
    # along the body z axis.
    plant.reset(position=(0.0, 0.0, 0.5), rpy=(0.0, 0.0, 0.0))
    plant.apply_thrusts(np.full(4, plant.mass * 9.81 / 4.0))
    for _ in range(5):
        plant.step()
    accel = plant.read_sensors()["accel"]
    assert accel[2] == pytest.approx(9.81, rel=0.05)


def test_quadrotor_bridge_measured_params_and_hover():
    plant = QuadrotorBridge()
    params = plant.solver_params()
    # Mass = core + 4 rotors from the MJCF; arm = planar rotor distance.
    assert abs(params.mass - 1.325) < 1e-6
    assert abs(params.arm - float(np.hypot(0.14, 0.18))) < 1e-9

    controller = make_quadrotor_mpc(horizon=50, quad_params=params)
    state = controller.init_state()
    plant.reset(position=(0.0, 0.0, 0.2), rpy=(0.1, 0.0, 0.0))

    x_ref = np.zeros(12)
    x_ref[2] = 0.5
    u_host = np.zeros(4)
    for step in range(2500):  # 2.5 s, MPC every 20 ms
        if step % 20 == 0:
            x = plant.read_state()
            u, _, state = controller.step(jnp.asarray(x, dtype=jnp.float32), state)
            u_host = np.asarray(u)
            plant.apply_thrusts(u_host)
        plant.step()

    final = plant.read_state()
    assert np.linalg.norm(final - x_ref) < 0.05, f"did not reach hover: {final}"
    # Hover thrust ~ m g / 4 per rotor.
    np.testing.assert_allclose(u_host, params.mass * 9.81 / 4.0, rtol=0.05)


def test_host_loop_collection_from_mujoco_plant(tmp_path):
    """`collect_gain_dataset_host` against the real MuJoCo cart-pole: rows
    have the training layout, come from MISMATCHED closed-loop states (the
    plant's trajectory, not the solver model's), and the .qtshard flush
    round-trips (VERDICT r1 missing #1)."""
    import jax.numpy as jnp

    from quattro_tpu.solver import (
        ILQRConfig,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import cartpole_dynamics, make_discrete
    from quattro_tpu.training import ShardDataset, collect_gain_dataset_host

    horizon = 12
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))

    plant = CartPoleBridge()
    seen_states = []

    def reset_fn(x0):
        plant.reset(position=float(x0[0]), angle=float(x0[2]))

    def read_fn():
        s = plant.read_state()
        seen_states.append(s.copy())
        return s

    shard = str(tmp_path / "mismatch.qtshard")
    x0s = np.array([[0.1, 0, 0.2, 0], [-0.2, 0, -0.1, 0]])
    dataset = collect_gain_dataset_host(
        reset_fn, read_fn, lambda u: plant.apply_control(float(u[0])), plant.step,
        dyn, cost, fcost, x0s, horizon, 1, sim_steps=6,
        config=ILQRConfig(tol=1e-1, max_iter=4), shard_path=shard,
    )

    assert dataset.x_data.shape[1:] == (horizon + 1, 4)
    assert dataset.kk_data.shape[1:] == (horizon, 5)
    assert dataset.x_data.shape[0] >= 12  # >= 1 iteration per control step

    # The logged iteration-start states are the PLANT's closed-loop states:
    # every row's first state must be one the MuJoCo bridge actually reported.
    seen = np.stack(seen_states)
    first_states = dataset.x_data[:, 0, :]
    for row in first_states[:: max(1, len(first_states) // 8)]:
        assert np.min(np.linalg.norm(seen - row, axis=1)) < 1e-5

    # Crash-bounded flush: one shard record per run, loadable back.
    sd = ShardDataset(shard)
    try:
        assert len(sd) == dataset.x_data.shape[0]
        xg, kg = sd.gather(np.arange(len(sd)))
        np.testing.assert_allclose(xg, dataset.x_data, rtol=1e-6)
        np.testing.assert_allclose(kg, dataset.kk_data, rtol=1e-6)
    finally:
        sd.close()
