"""Error-norm blending weight between a primary controller and LQR fallback.

Capability parity with ``ControllerSwitcher``
(examples/cartpole/cartpole_mpc.py:10-116): weight 0 below ``epsilon_low``
(full LQR), 1 above ``epsilon_high`` (full primary), linear ramp between.
Pure function — no error-history state is needed because the reference's
acceleration damping is dead code (cartpole_mpc.py:102-113, SURVEY.md §7.8);
the capability preserved is the error-norm ramp actually used.
"""

from __future__ import annotations

import jax.numpy as jnp


def blending_weight(
    error: jnp.ndarray,
    epsilon_low: float = 0.5,
    epsilon_high: float = 1.5,
) -> jnp.ndarray:
    """w in [0,1]: 0 -> full LQR, 1 -> full primary (cartpole_mpc.py:93-100).

    Defaults match the MPC constructor's switcher params
    (cartpole_mpc.py:223-229).
    """
    e_norm = jnp.linalg.norm(error)
    ramp = (e_norm - epsilon_low) / (epsilon_high - epsilon_low)
    return jnp.clip(ramp, 0.0, 1.0)
