"""Symmetric block-tridiagonal matrices: the trajectory KKT structure.

The Newton/KKT system of the trajectory QP is block-sparse; eliminating the
controls and states locally leaves a symmetric positive-definite
block-tridiagonal system in the dynamics multipliers (the "dual Schur
complement"). Its block Cholesky factorization is Riccati-equivalent
(solver/riccati.py holds the value-space recursion); this module supplies the
matrix TYPE, the block-banded SpMV (jnp + Pallas), the KKT assembly from an
LQ subproblem, a block-Thomas solve, and residual evaluation — the structured
sparse linear-algebra core of the BASELINE.json north star with its
block-nnz/s accounting.

Derivation of ``build_lqr_kkt`` (stage data already cross-term-eliminated as
in solver/riccati.py:_stage_elements, so stages are
``0.5 dx' ltil_xx dx + ltil_x' dx + 0.5 w' l_uu w`` with dynamics
``dx_{t+1} = Atil_t dx_t + B_t w_t + b_t``, ``dx_0 = 0``):

    w_t   = -l_uu^{-1} B_t' lam_{t+1}
    dx_t  = Z_t (lam_t - ltil_x_t - Atil_t' lam_{t+1}),   Z_t = ltil_xx_t^{-1}
    dx_H  = Z_H (lam_H - v_x),                            Z_H = V_xx^{-1}

substituted into the constraints gives, for rows r = 1..H (lam_r):

    -Atil_{r-1} Z_{r-1} lam_{r-1}
    + (Z_r + Atil_{r-1} Z_{r-1} Atil_{r-1}' + W_{r-1}) lam_r
    - Z_r Atil_r' lam_{r+1}
    = b_{r-1} - Atil_{r-1} Z_{r-1} ltil_x_{r-1} + Z_r ltil_x_r

with ``W_t = B_t l_uu^{-1} B_t'``, ``Z_0 = 0`` and ``ltil_x_H := v_x``. Each
diagonal block is a sum of PSD terms with Z_r PD, so the system is SPD.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from quattro_tpu.solver.derivatives import CostExpansion


class BlockTridiagonal(NamedTuple):
    """Symmetric block-tridiagonal matrix.

    ``diag``: (N, n, n) diagonal blocks D_0..D_{N-1}
    ``lower``: (N-1, n, n) sub-diagonal blocks; block (t+1, t) is
    ``lower[t]`` and block (t, t+1) is ``lower[t]^T`` by symmetry.
    """

    diag: jnp.ndarray
    lower: jnp.ndarray

    @property
    def num_blocks(self) -> int:
        return self.diag.shape[0]

    @property
    def block_nnz(self) -> int:
        """Nonzero block count (diag + both bands) — the unit of the
        north-star throughput metric (block-nnz/s)."""
        return self.diag.shape[0] + 2 * self.lower.shape[0]


def btd_matvec(mat: BlockTridiagonal, x: jnp.ndarray) -> jnp.ndarray:
    """y = M x for block vectors x of shape (N, n).

    Three batched (N, n, n) x (N, n) block products — MXU-shaped, no gather.
    """
    y = jnp.einsum("tij,tj->ti", mat.diag, x)
    lo = jnp.einsum("tij,tj->ti", mat.lower, x[:-1])  # block (t+1, t) @ x_t
    up = jnp.einsum("tji,tj->ti", mat.lower, x[1:])  # block (t, t+1) @ x_{t+1}
    y = y.at[1:].add(lo)
    y = y.at[:-1].add(up)
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def btd_matvec_pallas(mat: BlockTridiagonal, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas TPU kernel for the block-banded SpMV.

    The three band products are fused in VMEM: one HBM read per operand, one
    write for the output, no intermediate HBM traffic. Structure-of-arrays
    layout (lanes = block index) with the block axis tiled by a 1-D grid, so
    the VMEM working set is bounded regardless of N. Use ``interpret=True``
    off-TPU (CPU tests); Mosaic-lowering coverage comes from the benchmark
    suite's kernels section, which runs this on real TPU.
    """
    num_blocks, n, _ = mat.diag.shape

    # Align bands per output row: row t sums lower[t-1] @ x_{t-1},
    # diag[t] @ x_t, lower[t]^T @ x_{t+1}; zero-pad the boundaries.
    # Stack the three bands into one (N, n, 3n) operand and the shifted block
    # vectors into (N, 3n): row t computes ONE contraction
    #   y_t = [lower[t-1] | diag[t] | lower[t]^T] @ [x_{t-1}; x_t; x_{t+1}]
    # (single einsum — Mosaic rejects both "tji" contractions and multi-op
    # accumulation chains; the upper band is pre-transposed host-side).
    zeros_block = jnp.zeros((1, n, n), mat.diag.dtype)
    band_prev = jnp.concatenate([zeros_block, mat.lower], axis=0)  # (N, n, n)
    band_next = jnp.concatenate(
        [jnp.swapaxes(mat.lower, -1, -2), zeros_block], axis=0
    )  # (N, n, n)
    band = jnp.concatenate([band_prev, mat.diag, band_next], axis=-1)  # (N, n, 3n)
    zeros_vec = jnp.zeros((1, n), x.dtype)
    x_sta = jnp.concatenate(
        [
            jnp.concatenate([zeros_vec, x[:-1]], axis=0),
            x,
            jnp.concatenate([x[1:], zeros_vec], axis=0),
        ],
        axis=-1,
    )  # (N, 3n)

    # Structure-of-arrays: lanes = block index (large, dense); a (…, n, 3n)
    # per-block layout would pad its 3n=36-wide lane dim to 128 on TPU (3.5x
    # VMEM/HBM inflation — the first version OOMed scoped VMEM). Each output
    # row i is an unrolled multiply-accumulate over the 3n stacked columns.
    # Round the tile up to a lane-aligned multiple of 128 (the padding path
    # below already handles num_blocks % tile != 0).
    tile = min(2048, ((max(128, num_blocks) + 127) // 128) * 128)
    padded = ((num_blocks + tile - 1) // tile) * tile
    if padded != num_blocks:
        pad = padded - num_blocks
        band = jnp.pad(band, [(0, pad), (0, 0), (0, 0)])
        x_sta = jnp.pad(x_sta, [(0, pad), (0, 0)])
    band_soa = band.reshape(padded, n * 3 * n).T  # (3n^2, N_pad)
    x_soa = x_sta.T  # (3n, N_pad)

    def kernel(band_ref, x_ref, out_ref):
        bv = band_ref[...]  # (3n^2, tile)
        xv = x_ref[...]  # (3n, tile)
        for i in range(n):
            acc = bv[i * 3 * n, :] * xv[0, :]
            for j in range(1, 3 * n):
                acc = acc + bv[i * 3 * n + j, :] * xv[j, :]
            out_ref[i, :] = acc

    from jax.experimental import pallas as pl

    out_soa = pl.pallas_call(
        kernel,
        grid=(padded // tile,),
        out_shape=jax.ShapeDtypeStruct((n, padded), x.dtype),
        in_specs=[
            pl.BlockSpec((n * 3 * n, tile), lambda i: (0, i)),
            pl.BlockSpec((3 * n, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n, tile), lambda i: (0, i)),
        interpret=interpret,
    )(band_soa, x_soa)
    return out_soa.T[:num_blocks]


class LQRKKTSystem(NamedTuple):
    """Dual-Schur KKT system M lam = rhs plus the data to recover (dx, w)."""

    matrix: BlockTridiagonal
    rhs: jnp.ndarray  # (H, n)
    z_seq: jnp.ndarray  # (H, n, n): Z_1..Z_H (stage-Hessian inverses)
    a_til: jnp.ndarray  # (H, n, n)
    ltil_x: jnp.ndarray  # (H+1, n): ltil_x_0..ltil_x_{H-1}, v_x


def build_lqr_kkt(
    a_seq: jnp.ndarray,  # (H, n, n)
    b_seq: jnp.ndarray,  # (H, n, m)
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
) -> LQRKKTSystem:
    """Assemble the SPD dual-Schur block-tridiagonal system of an LQ problem.

    See module docstring for the derivation. ``reg`` regularizes l_uu (as in
    the parallel Riccati) and the stage-Hessian inverses.
    """
    horizon, n, _ = a_seq.shape
    m = b_seq.shape[-1]
    eye_m = jnp.eye(m, dtype=a_seq.dtype)
    eye_n = jnp.eye(n, dtype=a_seq.dtype)

    def stage(a, b, l_x, l_u, l_xx, l_uu, l_ux):
        luu_reg = l_uu + reg * eye_m
        rhs = jnp.concatenate([l_u[:, None], l_ux, b.T], axis=1)
        sol = jnp.linalg.solve(luu_reg, rhs)
        luu_inv_lu, luu_inv_lux, luu_inv_bt = sol[:, 0], sol[:, 1 : 1 + n], sol[:, 1 + n :]
        a_til = a - b @ luu_inv_lux
        w = b @ luu_inv_bt
        b_off = -b @ luu_inv_lu
        ltil_x = l_x - l_ux.T @ luu_inv_lu
        ltil_xx = l_xx - l_ux.T @ luu_inv_lux
        return a_til, w, b_off, ltil_x, ltil_xx

    a_til, w_seq, b_off, ltil_x, ltil_xx = jax.vmap(stage)(
        a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux
    )

    # Z_r = inverse stage Hessian at rows 1..H (terminal block for r = H).
    h_blocks = jnp.concatenate([ltil_xx[1:], v_xx_final[None]], axis=0)  # (H, n, n)
    z_seq = jnp.linalg.inv(h_blocks + reg * eye_n)

    # ltil_x at rows 0..H with the terminal gradient appended.
    grad_seq = jnp.concatenate([ltil_x, v_x_final[None]], axis=0)  # (H+1, n)

    z_prev = jnp.concatenate([jnp.zeros((1, n, n), a_seq.dtype), z_seq[:-1]], axis=0)
    diag = z_seq + a_til @ z_prev @ jnp.swapaxes(a_til, -1, -2) + w_seq
    lower = -(a_til[1:] @ z_seq[:-1])

    rhs = (
        b_off
        - jnp.einsum("tij,tj->ti", a_til @ z_prev, grad_seq[:-1])
        + jnp.einsum("tij,tj->ti", z_seq, grad_seq[1:])
    )
    return LQRKKTSystem(
        matrix=BlockTridiagonal(diag=diag, lower=lower),
        rhs=rhs,
        z_seq=z_seq,
        a_til=a_til,
        ltil_x=grad_seq,
    )


def btd_solve(mat: BlockTridiagonal, rhs: jnp.ndarray) -> jnp.ndarray:
    """Block-Thomas (block Cholesky) solve of the SPD system M x = rhs.

    Forward sweep is a ``lax.scan`` (the factorization IS the sequential
    Riccati-style recursion); the horizon-parallel route is the associative
    scan in solver/riccati.py.
    """

    def fwd(carry, inp):
        s_prev, y_prev = carry  # Schur complement and partial solution
        d, e, r = inp  # diag_t, lower_{t-1} (coupling to previous), rhs_t
        # Schur update: S_t = D_t - E_{t-1} S_{t-1}^{-1} E_{t-1}^T
        gain = jnp.linalg.solve(s_prev, e.T).T  # E S^{-1}
        s_t = d - gain @ e.T
        y_t = r - gain @ y_prev
        return (s_t, y_t), (s_t, y_t, gain)

    n = mat.diag.shape[-1]
    # Prepend an identity "virtual" previous block with zero coupling.
    e_seq = jnp.concatenate([jnp.zeros((1, n, n), mat.diag.dtype), mat.lower], axis=0)
    init = (jnp.eye(n, dtype=mat.diag.dtype), jnp.zeros((n,), mat.diag.dtype))
    (_, _), (s_seq, y_seq, _) = jax.lax.scan(fwd, init, (mat.diag, e_seq, rhs))

    def bwd(x_next, inp):
        s, y, e_next = inp  # lower[t] couples x_{t+1} with x_t
        x_t = jnp.linalg.solve(s, y - e_next.T @ x_next)
        return x_t, x_t

    e_next_seq = jnp.concatenate([mat.lower, jnp.zeros((1, n, n), mat.diag.dtype)], axis=0)
    _, x_seq = jax.lax.scan(bwd, jnp.zeros((n,), mat.diag.dtype), (s_seq, y_seq, e_next_seq), reverse=True)
    return x_seq


def recover_primal(system: LQRKKTSystem, lam: jnp.ndarray) -> jnp.ndarray:
    """Recover the state perturbations dx_1..dx_H from multipliers lam_1..lam_H.

    dx_r = Z_r (lam_r - ltil_x_r - Atil_r' lam_{r+1}), with lam_{H+1} = 0 and
    ltil_x_H = v_x.
    """
    lam_next = jnp.concatenate([lam[1:], jnp.zeros((1, lam.shape[-1]), lam.dtype)], axis=0)
    a_til_rows = jnp.concatenate([system.a_til[1:], jnp.zeros_like(system.a_til[:1])], axis=0)
    inner = lam - system.ltil_x[1:] - jnp.einsum("tji,tj->ti", a_til_rows, lam_next)
    return jnp.einsum("tij,tj->ti", system.z_seq, inner)


def kkt_residual(mat: BlockTridiagonal, solution: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """||M z - r||_inf per block row — factorization-quality telemetry."""
    return jnp.max(jnp.abs(btd_matvec(mat, solution) - rhs), axis=-1)
