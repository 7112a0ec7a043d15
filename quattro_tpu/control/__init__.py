"""MPC orchestration layer: receding-horizon controllers with warm starts.

TPU-native replacement for the reference's MPC classes
(examples/cartpole/cartpole_mpc.py, examples/quadrotor/quadrotor_mpc.py):
the per-step ``control_step`` is a single jitted function whose carried state
(warm-started control sequence) is an explicit array, and mode selection
(LQR / iLQR / hybrid / blend) is resolved at trace time.
"""

from quattro_tpu.control.switcher import blending_weight
from quattro_tpu.control.mpc import (
    MPCController,
    MPCState,
    build_mpc,
    make_cartpole_mpc,
    make_quadrotor_mpc,
)

__all__ = [
    "blending_weight",
    "MPCController",
    "MPCState",
    "build_mpc",
    "make_cartpole_mpc",
    "make_quadrotor_mpc",
]
