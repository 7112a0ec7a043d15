"""Unrolled LU factor-and-solve for batches of small well-conditioned systems.

XLA's batched ``lu`` on TPU lowers to a pivoting while-loop with dynamic
slices — measured 2.5-5x slower than pivot-free elimination for the n <= 16
blocks in the associative Riccati combine (benchmarks/results_tpu.json; the
combine's two n x n solves dominated its runtime). The elimination below
unrolls at trace time over the (static, small) matrix dimension in **dense
masked** form: every step is a full-matrix elementwise op or a row-times-block
contraction, with constant boolean masks selecting the active triangle. No
scatters (``.at`` updates vectorize terribly under vmap batching) and no
per-lane scalar graphs (O(n^3) HLO ops blew compile time up ~10x in a first
version): O(n) fused dense ops per factorization/solve.

No pivoting: callers must guarantee matrices that are stably eliminable
without pivoting. The Riccati combine's left-hand side is ``I + C J`` with
C, J PSD (value-element composition, solver/riccati.py::_combine): its
spectrum is ``1 + eig(C^{1/2} J C^{1/2}) >= 1``, so growth is benign.
Optional iterative-refinement steps (residual re-solve through the SAME
factorization) recover the last f32 digits where needed; parity vs
``jnp.linalg.solve`` is pinned in tests/test_ops.py.

Both ``A x = b`` and ``A^T y = c`` reuse one factorization: A = L U gives
``A^T = U^T L^T`` (forward-substitute the lower-triangular U^T, then
back-substitute the unit-upper L^T).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def unrolled_lu(a: jnp.ndarray) -> jnp.ndarray:
    """Doolittle LU without pivoting, unrolled over the (small) trailing dims.

    Args:
        a: (..., n, n) matrices; leading dims are the vectorized batch.

    Returns:
        Packed factors (..., n, n): strictly-lower part holds the unit-lower
        multipliers L, diagonal and upper hold U.
    """
    n = a.shape[-1]
    idx = np.arange(n)
    for k in range(n - 1):
        piv = a[..., k, k][..., None]  # (..., 1)
        mult = jnp.where(idx > k, a[..., :, k] / piv, 0.0)  # (..., n) L column k
        row = jnp.where(idx > k, a[..., k, :], 0.0)  # (..., n) U row k, cols > k
        # Schur update of the trailing block + write multipliers into col k
        # (the masked outer product leaves column k untouched).
        a = a - mult[..., :, None] * row[..., None, :]
        col_k_mask = np.logical_and.outer(idx > k, idx == k)  # (n, n) const
        a = jnp.where(col_k_mask, mult[..., :, None], a)
    return a


def lu_solve(lu: jnp.ndarray, b: jnp.ndarray, transpose: bool = False) -> jnp.ndarray:
    """Solve A x = b (or A^T x = b) from ``unrolled_lu`` packed factors.

    Args:
        lu: (..., n, n) packed factors.
        b: (..., n, r) right-hand sides.
        transpose: solve with A^T instead of A.

    Returns:
        x: (..., n, r).
    """
    n = lu.shape[-1]
    idx = np.arange(n)

    def row_contract(mat_row, x):
        # (..., n) x (..., n, r) -> (..., r)
        return jnp.einsum("...j,...jr->...r", mat_row, x)

    def set_row(x, i, value):
        # Dense row write: (..., n, r) with row i replaced by value (..., r).
        return jnp.where((idx == i)[:, None], value[..., None, :], x)

    if not transpose:
        # L y = b (unit lower, multipliers below diag), then U x = y.
        for i in range(1, n):
            l_row = jnp.where(idx < i, lu[..., i, :], 0.0)
            b = set_row(b, i, b[..., i, :] - row_contract(l_row, b))
        for i in reversed(range(n)):
            u_row = jnp.where(idx > i, lu[..., i, :], 0.0)
            val = (b[..., i, :] - row_contract(u_row, b)) / lu[..., i, i][..., None]
            b = set_row(b, i, val)
        return b
    # A^T = U^T L^T: U^T y = b (lower, diag of U), then L^T x = y (unit upper).
    for i in range(n):
        ut_row = jnp.where(idx < i, lu[..., :, i], 0.0)  # column i of U, above diag
        val = (b[..., i, :] - row_contract(ut_row, b)) / lu[..., i, i][..., None]
        b = set_row(b, i, val)
    for i in reversed(range(n - 1)):
        lt_row = jnp.where(idx > i, lu[..., :, i], 0.0)  # column i of L, below diag
        b = set_row(b, i, b[..., i, :] - row_contract(lt_row, b))
    return b


def batched_small_solve(
    a: jnp.ndarray,
    b: jnp.ndarray,
    transpose: bool = False,
    refine_steps: int = 1,
) -> jnp.ndarray:
    """Solve batches of small systems A x = b (optionally A^T x = b).

    One unrolled factorization + triangular solves + ``refine_steps`` rounds
    of iterative refinement (each: one residual matmul + one re-solve through
    the cached factors).
    """
    factors = unrolled_lu(a)
    x = lu_solve(factors, b, transpose=transpose)
    a_eff = jnp.swapaxes(a, -1, -2) if transpose else a
    for _ in range(refine_steps):
        r = b - a_eff @ x
        x = x + lu_solve(factors, r, transpose=transpose)
    return x
