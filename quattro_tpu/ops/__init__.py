"""Structured sparse linear algebra + Pallas kernels.

The BASELINE.json north star: the trajectory KKT matrix is block-tridiagonal;
the Riccati recursion is its structured factorization; linearization and gain
application are batched block ops. This package holds the structured types and
the TPU kernels:

- ``blocktridiag``: symmetric block-tridiagonal type, block-banded SpMV
  (jnp + Pallas), trajectory-QP KKT assembly and residual evaluation.
- ``smallchol``: batched Cholesky factorize-and-solve for the tiny SPD systems
  at the heart of the backward pass (Q_uu, m <= ~8), fully unrolled so the VPU
  executes them as elementwise vector code instead of lax.linalg loops.
"""

from quattro_tpu.ops.blocktridiag import (
    BlockTridiagonal,
    btd_matvec,
    btd_matvec_pallas,
    build_lqr_kkt,
    kkt_residual,
)
from quattro_tpu.ops.smallchol import batched_cholesky_solve, batched_spd_solve

__all__ = [
    "BlockTridiagonal",
    "btd_matvec",
    "btd_matvec_pallas",
    "build_lqr_kkt",
    "kkt_residual",
    "batched_cholesky_solve",
    "batched_spd_solve",
]
