"""Per-feature z-score normalization as an immutable pytree.

Capability parity with the reference's ``DataNormalizer``
(quattro_ilqr_tf/transformer_model.py:15-50): fit over axes (0, 1) of
(N, T, dim) data with eps=1e-6, forward/inverse transforms. Being a NamedTuple
of arrays, it passes straight through ``jit`` boundaries — normalization runs
on device inside the solver, not on the host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DataNormalizer(NamedTuple):
    x_mean: jnp.ndarray  # (state_dim,)
    x_std: jnp.ndarray  # (state_dim,)
    u_mean: jnp.ndarray  # (control_dim,) -- gain-token features
    u_std: jnp.ndarray  # (control_dim,)

    @staticmethod
    def fit(x_data: jnp.ndarray, u_data: jnp.ndarray, eps: float = 1e-6) -> "DataNormalizer":
        """Fit statistics over (N, T, dim) arrays (transformer_model.py:28-32)."""
        return DataNormalizer(
            x_mean=x_data.mean(axis=(0, 1)),
            x_std=x_data.std(axis=(0, 1)) + eps,
            u_mean=u_data.mean(axis=(0, 1)),
            u_std=u_data.std(axis=(0, 1)) + eps,
        )

    @staticmethod
    def identity(state_dim: int, control_dim: int, dtype=jnp.float32) -> "DataNormalizer":
        """No-op normalizer (mean 0, std 1)."""
        return DataNormalizer(
            x_mean=jnp.zeros((state_dim,), dtype),
            x_std=jnp.ones((state_dim,), dtype),
            u_mean=jnp.zeros((control_dim,), dtype),
            u_std=jnp.ones((control_dim,), dtype),
        )

    def transform_x(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.x_mean) / self.x_std

    def transform_u(self, u: jnp.ndarray) -> jnp.ndarray:
        return (u - self.u_mean) / self.u_std

    def inverse_transform_u(self, u: jnp.ndarray) -> jnp.ndarray:
        return u * self.u_std + self.u_mean
