"""12-state quadrotor plant as a pure jnp vector field.

Behavioral contract (reference: examples/quadrotor/quadrotor_dynamics.py):
state ``x = [p(3), v(3), (roll, pitch, yaw), (p, q, r)]``, control = four rotor
thrusts (N). Euler-angle thrust rotation (quadrotor_dynamics.py:109-113),
Euler-rate kinematics with tan/sec terms (:122-124), diagonal-inertia angular
dynamics (:152-154), X-configuration torque mixing with yaw coefficient 0.01
(:139-146).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuadrotorParams(NamedTuple):
    """Physical parameters; defaults match the reference (quadrotor_dynamics.py:17-23).

    The reference's MuJoCo wrapper re-parameterizes these from the compiled
    Skydio X2 model (examples/quadrotor/quadrotor_wrapper.py:29-83); pass
    measured values here for the same capability.
    """

    mass: float = 1.0
    inertia_x: float = 0.02
    inertia_y: float = 0.02
    inertia_z: float = 0.04
    arm: float = 0.1
    gravity: float = 9.81
    k_yaw: float = 0.01


def quadrotor_dynamics(x: jnp.ndarray, u: jnp.ndarray, params: QuadrotorParams = QuadrotorParams()) -> jnp.ndarray:
    """Continuous-time state derivative dx/dt, shape (12,)."""
    vel = x[3:6]
    roll, pitch, yaw = x[6], x[7], x[8]
    p, q, r = x[9], x[10], x[11]

    thrust = jnp.sum(u)

    c_roll, s_roll = jnp.cos(roll), jnp.sin(roll)
    c_pitch, s_pitch = jnp.cos(pitch), jnp.sin(pitch)
    c_yaw, s_yaw = jnp.cos(yaw), jnp.sin(yaw)

    # Inertial-frame acceleration from body-z thrust (quadrotor_dynamics.py:109-111).
    accel = jnp.stack(
        [
            (thrust / params.mass) * (s_yaw * s_roll + c_yaw * s_pitch * c_roll),
            (thrust / params.mass) * (c_yaw * s_roll - s_yaw * s_pitch * c_roll),
            -params.gravity + (thrust / params.mass) * (c_pitch * c_roll),
        ]
    )

    # Euler-angle kinematics (quadrotor_dynamics.py:122-124).
    tan_pitch = jnp.tan(pitch)
    euler_rates = jnp.stack(
        [
            p + q * s_roll * tan_pitch + r * c_roll * tan_pitch,
            q * c_roll - r * s_roll,
            (q * s_roll + r * c_roll) / c_pitch,
        ]
    )

    # X-configuration torque mixing (quadrotor_dynamics.py:139-146).
    u1, u2, u3, u4 = u[0], u[1], u[2], u[3]
    tau_roll = params.arm * ((u2 + u3) - (u1 + u4))
    tau_pitch = params.arm * ((u1 + u2) - (u3 + u4))
    tau_yaw = params.k_yaw * (u1 - u2 + u3 - u4)

    ix, iy, iz = params.inertia_x, params.inertia_y, params.inertia_z
    body_rate_dot = jnp.stack(
        [
            ((iy - iz) / ix) * q * r + tau_roll / ix,
            ((iz - ix) / iy) * p * r + tau_pitch / iy,
            ((ix - iy) / iz) * p * q + tau_yaw / iz,
        ]
    )

    return jnp.concatenate([vel, accel, euler_rates, body_rate_dot])


def hover_control(params: QuadrotorParams = QuadrotorParams()) -> jnp.ndarray:
    """Equilibrium thrust-per-rotor u_eq = m*g/4 (quadrotor_dynamics.py:224-227)."""
    return jnp.full((4,), params.mass * params.gravity / 4.0)
