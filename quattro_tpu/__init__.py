"""quattro_tpu — TPU-native transformer-accelerated iLQR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``salemon/quattro-transformer-ilqr`` (reference: /root/reference):

- Structured trajectory optimization: the trajectory KKT system is
  block-tridiagonal; its factorization is the Riccati recursion, built here
  both as a sequential ``lax.scan`` and as an associative-scan *parallel*
  Riccati that maps onto the TPU's MXU and scales over a device mesh.
- Learned acceleration: a decoder-only transformer predicts the head of the
  gain sequence ``(k_t, K_t)`` from the exact tail window, fused into the
  jitted solve (no host/device boundary per iteration, unlike the reference's
  ``tf.predict`` host round-trip at quattro_ilqr_tf/quattro_ilqr_tf.py:507).
- Parallel runtime: trajectory-batch and horizon axes partitioned over a
  ``jax.sharding.Mesh`` with XLA collectives.

Public API mirrors the reference package exports
(quattro_ilqr_tf/__init__.py:1-3) in TPU-native form.
"""

from quattro_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRSolution,
    ilqr_solve,
    ilqr_solve_with_logs,
    hybrid_ilqr_solve,
)
from quattro_tpu.models.normalizer import DataNormalizer
from quattro_tpu.models.transformer import TransformerPredictor
from quattro_tpu.models.gain_predictor import GainPredictor

__all__ = [
    "ILQRConfig",
    "ILQRSolution",
    "ilqr_solve",
    "ilqr_solve_with_logs",
    "hybrid_ilqr_solve",
    "DataNormalizer",
    "TransformerPredictor",
    "GainPredictor",
]

__version__ = "0.1.0"
