"""Batched Cholesky factorize-and-solve for tiny SPD systems.

The backward pass solves one m x m SPD system (regularized Q_uu) per horizon
step; m is 1 (cart-pole) or 4 (quadrotor). ``lax.linalg`` routines are built
for big matrices and lower poorly for huge batches of tiny ones on TPU; here
the Cholesky-Crout factorization and both triangular solves are fully unrolled
over the (static, small) matrix dimension, so a batch of B systems becomes
O(m^2) *elementwise vector ops* over B-length lanes — pure VPU code with no
data-dependent control flow.

Replaces the reference's explicit ``np.linalg.inv(Q_uu_reg)``
(quattro_ilqr_tf.py:306) — a quirk not to replicate (SURVEY.md §7.8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _unrolled_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of (..., m, m) SPD matrices, unrolled over m.

    Returns lower-triangular L with A = L L^T. Python loops run at trace time
    (m is static and small); all array ops are batched over leading dims.
    """
    m = a.shape[-1]
    cols = [[None] * m for _ in range(m)]  # cols[i][j] = L[i, j], j <= i
    for j in range(m):
        diag = a[..., j, j]
        for k in range(j):
            diag = diag - cols[j][k] * cols[j][k]
        ljj = jnp.sqrt(diag)
        cols[j][j] = ljj
        inv_ljj = 1.0 / ljj
        for i in range(j + 1, m):
            off = a[..., i, j]
            for k in range(j):
                off = off - cols[i][k] * cols[j][k]
            cols[i][j] = off * inv_ljj
    rows = [
        jnp.stack(
            [cols[i][j] if j <= i else jnp.zeros_like(cols[i][i]) for j in range(m)], axis=-1
        )
        for i in range(m)
    ]
    return jnp.stack(rows, axis=-2)


def _forward_substitute(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b for lower-triangular L; b is (..., m, r)."""
    m = l.shape[-1]
    ys = []
    for i in range(m):
        acc = b[..., i, :]
        for k in range(i):
            acc = acc - l[..., i, k][..., None] * ys[k]
        ys.append(acc / l[..., i, i][..., None])
    return jnp.stack(ys, axis=-2)


def _back_substitute(l: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y for lower-triangular L; y is (..., m, r)."""
    m = l.shape[-1]
    xs: list = [None] * m
    for i in reversed(range(m)):
        acc = y[..., i, :]
        for k in range(i + 1, m):
            acc = acc - l[..., k, i][..., None] * xs[k]
        xs[i] = acc / l[..., i, i][..., None]
    return jnp.stack(xs, axis=-2)


def batched_cholesky_solve(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve A X = B for batches of small SPD A.

    Args:
        a: (..., m, m) SPD matrices.
        b: (..., m, r) right-hand sides.

    Returns:
        (x, l): solution (..., m, r) and the Cholesky factor (..., m, m).
    """
    l = _unrolled_cholesky(a)
    y = _forward_substitute(l, b)
    x = _back_substitute(l, y)
    return x, l


def batched_spd_solve(a: jnp.ndarray, b: jnp.ndarray, small_dim_max: int = 8) -> jnp.ndarray:
    """SPD solve dispatching on size: unrolled Cholesky for m <= small_dim_max,
    LU (``jnp.linalg.solve``) otherwise."""
    if a.shape[-1] <= small_dim_max:
        x, _ = batched_cholesky_solve(a, b)
        return x
    return jnp.linalg.solve(a, b)


def batched_cholesky_solve_pallas(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas TPU kernel: fused Cholesky factorize-and-solve for a large batch
    of tiny SPD systems — the north star's "batched Q_uu Cholesky-and-solve".

    Layout trick: the (B, m, m) batch is transposed to structure-of-arrays
    (m*m, B) so the BATCH axis is the TPU lane dimension; every step of the
    unrolled factorization/substitution is then one (1, B) vector op on the
    VPU, and the whole solve runs out of VMEM with a single HBM round trip.

    The batch axis is tiled by a 1-D grid so VMEM holds one
    (m*m + 2*m*r, TILE) working set per program instance regardless of B
    (an ungridded first version OOMed scoped VMEM past B ~ 3e4).

    Measured (v5e, m=4, r=13, f32; benchmarks/results_tpu.json "kernels"):
    XLA compiles the pure-jnp unrolled form (``batched_cholesky_solve``) to
    the same VPU-lane code WITHOUT the SoA transposes this kernel pays on
    entry/exit, so the jnp form is as fast or faster (B=1M: 2.9 ms vs 3.9 ms) and is the
    solver's default. This kernel is kept as the explicit-kernel reference
    point and escape hatch if XLA's fusion ever regresses.

    Args:
        a: (B, m, m) SPD matrices, m small (<= ~8).
        b: (B, m, r) right-hand sides.
        interpret: run in interpreter mode (CPU tests).

    Returns:
        x: (B, m, r) with A x = b.
    """
    batch, m, _ = a.shape
    r = b.shape[-1]

    # Tile the lane (batch) axis; pad to a full multiple so every grid step
    # sees a static block. 2048 lanes x (16+52+52) rows x 4 B ~= 1 MB VMEM per
    # buffer (double-buffered pipeline on top). The tile is rounded up to a
    # multiple of 128 so lane tiles are always register-aligned — Mosaic's
    # unaligned-lane lowering is otherwise unexercised on hardware.
    tile = min(2048, ((max(128, batch) + 127) // 128) * 128)
    padded = ((batch + tile - 1) // tile) * tile
    if padded != batch:
        pad = padded - batch
        eye = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), (pad, m, m))
        a = jnp.concatenate([a, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, m, r), dtype=b.dtype)], axis=0)

    a_soa = a.reshape(padded, m * m).T  # (m*m, B_pad)
    b_soa = b.reshape(padded, m * r).T  # (m*r, B_pad)

    def kernel(a_ref, b_ref, x_ref):
        av = a_ref[...]  # (m*m, B)
        bv = b_ref[...]  # (m*r, B)

        def a_at(i, j):
            return av[i * m + j, :]

        def b_at(i, k):
            return bv[i * r + k, :]

        # Cholesky-Crout, unrolled; cols[i][j] are (B,) lanes.
        cols = [[None] * m for _ in range(m)]
        for j in range(m):
            diag = a_at(j, j)
            for k in range(j):
                diag = diag - cols[j][k] * cols[j][k]
            ljj = jnp.sqrt(diag)
            inv_ljj = 1.0 / ljj
            cols[j][j] = ljj
            for i in range(j + 1, m):
                off = a_at(i, j)
                for k in range(j):
                    off = off - cols[i][k] * cols[j][k]
                cols[i][j] = off * inv_ljj

        for k in range(r):
            # Forward: L y = b
            ys = []
            for i in range(m):
                acc = b_at(i, k)
                for t in range(i):
                    acc = acc - cols[i][t] * ys[t]
                ys.append(acc / cols[i][i])
            # Backward: L^T x = y
            xs = [None] * m
            for i in reversed(range(m)):
                acc = ys[i]
                for t in range(i + 1, m):
                    acc = acc - cols[t][i] * xs[t]
                xs[i] = acc / cols[i][i]
            for i in range(m):
                x_ref[i * r + k, :] = xs[i]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_soa = pl.pallas_call(
        kernel,
        grid=(padded // tile,),
        out_shape=jax.ShapeDtypeStruct((m * r, padded), a.dtype),
        in_specs=[
            pl.BlockSpec((m * m, tile), lambda i: (0, i)),
            pl.BlockSpec((m * r, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m * r, tile), lambda i: (0, i)),
        interpret=interpret,
    )(a_soa, b_soa)
    return x_soa.T.reshape(padded, m, r)[:batch]
