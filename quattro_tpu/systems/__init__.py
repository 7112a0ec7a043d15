"""Differentiable plant models (pure jnp functions, jit/vmap/grad-compatible).

Replaces the reference's NumPy dynamics classes
(examples/cartpole/cartpole_dynamics.py, examples/quadrotor/quadrotor_dynamics.py)
with functionally pure JAX equivalents whose Jacobians come from ``jax.jacfwd``
instead of central finite differences (quattro_ilqr_tf/quattro_ilqr_tf.py:182-204).
"""

from quattro_tpu.systems.integrators import euler_step, rk4_step, make_discrete
from quattro_tpu.systems.cartpole import CartPoleParams, cartpole_dynamics, cartpole_linearized
from quattro_tpu.systems.quadrotor import QuadrotorParams, quadrotor_dynamics, hover_control

__all__ = [
    "euler_step",
    "rk4_step",
    "make_discrete",
    "CartPoleParams",
    "cartpole_dynamics",
    "cartpole_linearized",
    "QuadrotorParams",
    "quadrotor_dynamics",
    "hover_control",
]
