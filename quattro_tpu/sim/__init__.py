"""Host-side MuJoCo validation harness (outside the jit boundary).

The reference uses MuJoCo as the in-loop plant and GLFW for interactive
visualization (examples/*/cartpole_sim.py, quadrotor_sim.py). Here the
JAX-native analytic plants are the in-loop models; MuJoCo remains as an
*external validation harness* — a ground-truth physics engine with
model mismatch — per SURVEY.md §2.4. Headless only (GLFW teleop explicitly
not rebuilt, SURVEY.md §8.4).
"""

from quattro_tpu.sim.mujoco_bridge import (
    CartPoleBridge,
    QuadrotorBridge,
    euler_to_quat,
    quat_to_rpy,
)

__all__ = ["CartPoleBridge", "QuadrotorBridge", "euler_to_quat", "quat_to_rpy"]
