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
- ``fused_riccati``: the ENTIRE batched backward Riccati recursion as one
  VMEM-resident Pallas kernel (measured 4.5x over the vmapped scan at the
  pod-feed shape on v5e) — the dispatched default for batched solves on TPU.
"""

from quattro_tpu.ops.blocktridiag import (
    BlockTridiagonal,
    LQRKKTSystem,
    btd_matvec,
    btd_matvec_pallas,
    btd_solve,
    build_lqr_kkt,
    kkt_residual,
    recover_primal,
)
from quattro_tpu.ops.smallchol import (
    batched_cholesky_solve,
    batched_cholesky_solve_pallas,
    batched_spd_solve,
)
from quattro_tpu.ops.smalllu import batched_small_solve, lu_solve, unrolled_lu
from quattro_tpu.ops.fused_riccati import (
    riccati_backward_batched_fused,
    riccati_backward_batched_fused2d,
    riccati_backward_batched_fused_auto,
    riccati_backward_fused_single,
)

__all__ = [
    "riccati_backward_batched_fused",
    "riccati_backward_batched_fused2d",
    "riccati_backward_batched_fused_auto",
    "riccati_backward_fused_single",
    "BlockTridiagonal",
    "LQRKKTSystem",
    "btd_matvec",
    "btd_matvec_pallas",
    "btd_solve",
    "build_lqr_kkt",
    "kkt_residual",
    "recover_primal",
    "batched_cholesky_solve",
    "batched_cholesky_solve_pallas",
    "batched_spd_solve",
    "batched_small_solve",
    "lu_solve",
    "unrolled_lu",
]
