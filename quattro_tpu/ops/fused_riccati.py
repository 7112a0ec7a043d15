"""Fused batched Riccati backward pass — one VMEM-resident Pallas kernel.

The batched regime (trajectory batch B >= ~8, SURVEY.md §8.1 "K" layer) runs
the sequential backward recursion as a vmapped ``lax.scan``
(solver/riccati.py); XLA executes each of the H steps as its own fusion with
the (V_x, V_xx) carry bouncing through HBM and per-step loop overhead —
measured ~20 us/step at the pod-feed shape (64 x 1024, n=12, m=4), i.e.
<1% of VPU peak. This kernel fuses the ENTIRE recursion:

- grid = (batch tiles, horizon blocks); the horizon dimension is iterated
  sequentially innermost, so the value-function carry lives in VMEM scratch
  for a whole batch tile and never touches HBM;
- per-step inputs stream HBM -> VMEM through the Pallas block pipeline
  (double-buffered by construction), outputs stream back per block;
- layout: every small matrix is stored COLUMN-major with the trajectory
  batch on the lane axis — ``M_cols[t, j] = M[:, j]`` as an (n, TILE_B)
  tile. A batched matmul column then is ``C[:, j] = sum_k M_cols[k] *
  N[k, j]`` — n FMAs of (n, TILE_B) tiles with the scalar ``N[k, j]``
  broadcast over sublanes, the natural VPU shape. No transposes happen
  inside the kernel; the host side pre-permutes (one XLA transpose per
  operand, bandwidth-bound).

Update-law semantics are EXACTLY ``riccati_backward``'s
(quattro_ilqr_tf.py:297-317 via solver/riccati.py:_gains_and_value):
Q-expansion, Tikhonov reg on the Q_uu solve only, value update with raw
Q_uu. The algebraic form used here,

    G      = (Q_uu + reg I)^{-1} Q_ux,      g = (Q_uu + reg I)^{-1} Q_u
    K      = -G,                            k = -g
    V_x'   = Q_x + K'(Q_uu k + Q_u) + Q_ux' k
    V_xx'  = Q_xx - G' Q_ux - reg G' G

is identical in exact arithmetic (G' Q_ux = G' (Q_uu + reg I) G is symmetric,
so V_xx' is symmetric BY CONSTRUCTION — the reference's explicit
symmetrization drops out).

Returns gains only (k_seq, big_k_seq) — the batched iLQR iteration never
reads the value sequences (solver/ilqr.py:_ilqr_iteration uses res.k_seq /
res.big_k_seq only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from quattro_tpu.solver.derivatives import CostExpansion

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def riccati_backward_batched_fused(
    a_seq: jnp.ndarray,  # (B, H, n, n)
    b_seq: jnp.ndarray,  # (B, H, n, m)
    cost_exp: CostExpansion,  # fields (B, H, ...)
    v_x_final: jnp.ndarray,  # (B, n)
    v_xx_final: jnp.ndarray,  # (B, n, n)
    reg: float = 1e-6,
    interpret: bool = False,
    tile_b: int = _LANE,
    block_t: int = 8,
    stream_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused backward pass over an explicit trajectory-batch axis.

    ``stream_dtype`` (e.g. ``jnp.bfloat16``): store and stream the per-stage
    inputs (A, B, cost expansion) in a narrower dtype, converting to the
    carry dtype after the VMEM load. The recursion carry (V_x, V_xx), all
    arithmetic, and the outputs stay in ``a_seq.dtype`` — this quantizes the
    INPUTS only. Halves the input VMEM footprint (wider batch tiles fit) and
    HBM traffic; costs ~1e-3 relative error on the gains (the bf16 mantissa
    of the stage data), measured in tests/test_fused_riccati.py. Opt-in.

    Returns (k_seq (B, H, m), big_k_seq (B, H, m, n)).
    """
    batch, horizon, n, _ = a_seq.shape
    m = b_seq.shape[-1]
    dtype = a_seq.dtype

    # ---- pad batch to a lane-tile multiple; benign pad content ----------
    b_pad = _round_up(max(batch, tile_b), tile_b)
    if b_pad != batch:
        p = b_pad - batch

        def padz(x):
            return jnp.concatenate([x, jnp.zeros((p,) + x.shape[1:], x.dtype)], axis=0)

        a_seq = padz(a_seq)
        b_seq = padz(b_seq)
        eye_m = jnp.broadcast_to(jnp.eye(m, dtype=dtype), (p, horizon, m, m))
        cost_exp = CostExpansion(
            l_x=padz(cost_exp.l_x),
            l_u=padz(cost_exp.l_u),
            l_xx=padz(cost_exp.l_xx),
            l_uu=jnp.concatenate([cost_exp.l_uu, eye_m], axis=0),
            l_ux=padz(cost_exp.l_ux),
        )
        v_x_final = padz(v_x_final)
        v_xx_final = padz(v_xx_final)

    # Horizon blocking: pad H to a block multiple with identity-dynamics,
    # zero-cost stages PREPENDED in time (they run last in the reverse
    # recursion and leave V unchanged only if A=I, B=0, costs=0 — then
    # k=K=0 for those steps and V passes through; we prepend so the real
    # steps' indices stay aligned at the END where the recursion starts).
    h_pad = _round_up(horizon, block_t)
    if h_pad != horizon:
        ph = h_pad - horizon

        def pre(x, fill):
            pad_block = jnp.broadcast_to(fill, (b_pad, ph) + x.shape[2:]).astype(x.dtype)
            return jnp.concatenate([pad_block, x], axis=1)

        a_seq = pre(a_seq, jnp.eye(n, dtype=dtype))
        b_seq = pre(b_seq, jnp.zeros((n, m), dtype))
        cost_exp = CostExpansion(
            l_x=pre(cost_exp.l_x, jnp.zeros((n,), dtype)),
            l_u=pre(cost_exp.l_u, jnp.zeros((m,), dtype)),
            l_xx=pre(cost_exp.l_xx, jnp.zeros((n, n), dtype)),
            l_uu=pre(cost_exp.l_uu, jnp.eye(m, dtype=dtype)),
            l_ux=pre(cost_exp.l_ux, jnp.zeros((m, n), dtype)),
        )

    # ---- host-side layout: column-major SoA, batch on lanes -------------
    # M (B, H, r, c) -> cols (H, c, r, B): cols[t, j] = M[:, j] per lane.
    def cols(x):
        return jnp.transpose(x, (1, 3, 2, 0))

    # M (B, H, r, c) -> rows-as-cols of M^T (H, r, c, B): rows[t, i] = M[i, :].
    def rows(x):
        return jnp.transpose(x, (1, 2, 3, 0))

    def vec(x):  # (B, H, d) -> (H, d, B)
        return jnp.transpose(x, (1, 2, 0))

    if stream_dtype is not None and jnp.dtype(stream_dtype) != jnp.dtype(dtype):
        narrow = lambda x: x.astype(stream_dtype)
    else:
        stream_dtype = None
        narrow = lambda x: x

    a_cols = narrow(cols(a_seq))
    at_cols = narrow(rows(a_seq))  # columns of A^T
    b_cols = narrow(cols(b_seq))  # (H, m, n, B)
    bt_cols = narrow(rows(b_seq))  # (H, n, m, B): bt_cols[t, k] = col k of B^T
    lxx_cols = narrow(cols(cost_exp.l_xx))  # symmetric
    lux_cols = narrow(cols(cost_exp.l_ux))  # (H, n, m, B): columns of l_ux
    luxt_cols = narrow(rows(cost_exp.l_ux))  # (H, m, n, B): columns of l_ux^T
    luu_cols = narrow(cols(cost_exp.l_uu))  # (H, m, m, B), symmetric
    lx_v = narrow(vec(cost_exp.l_x))  # (H, n, B)
    lu_v = narrow(vec(cost_exp.l_u))  # (H, m, B)
    vxf = v_x_final.T  # (n, B) — carry dtype (seeds the recursion)
    vxxf = jnp.transpose(v_xx_final, (2, 1, 0))  # (n, n, B) columns (symmetric)

    n_btiles = b_pad // tile_b
    n_hblocks = h_pad // block_t
    # Python float: baked into the kernel as a literal (a traced jnp scalar
    # would be a captured constant, which pallas_call rejects).
    reg_c = float(reg)

    def kernel(
        a_r, at_r, b_r, bt_r, lxx_r, lux_r, luxt_r, luu_r, lx_r, lu_r,
        vxf_r, vxxf_r, k_out, bigk_out, vx_s, vxx_s,
    ):
        from jax.experimental import pallas as pl

        @pl.when(pl.program_id(1) == 0)
        def _init():
            vx_s[...] = vxf_r[...]
            vxx_s[...] = vxxf_r[...]

        # One step body inside a fori_loop (reverse time within the block):
        # unrolling block_t copies of the ~700-op body made Mosaic compile
        # ~8x slower for no measurable runtime win.
        def step(i, _):
            tt = block_t - 1 - i
            # One widening convert per block read when streaming narrow
            # (stream_dtype): arithmetic and the carry stay in `dtype`.
            up = (lambda x: x.astype(dtype)) if stream_dtype is not None else (
                lambda x: x)
            av = up(a_r[tt])  # (n, n, B): av[j][k] = A[k, j]
            atv = up(at_r[tt])  # (n, n, B): atv[k] = At[:, k] = A[k, :]
            bv = up(b_r[tt])  # (m, n, B): bv[j][k] = B[k, j]
            btv = up(bt_r[tt])  # (n, m, B): btv[k] = Bt[:, k] (m, B)
            lxxv = up(lxx_r[tt])
            luxv = up(lux_r[tt])  # (n, m, B) cols of (m x n) l_ux
            luxtv = up(luxt_r[tt])  # (m, n, B) cols of l_ux^T
            luuv = up(luu_r[tt])
            lxv = up(lx_r[tt])  # (n, B)
            luv = up(lu_r[tt])  # (m, B)
            vx = vx_s[...]  # (n, B)
            vxx = vxx_s[...]  # (n, n, B) columns

            # T1 = Vxx @ A (n x n), T3 = Vxx @ B (n x m) — columns.
            t1 = [
                sum(vxx[k] * av[j, k] for k in range(n))
                for j in range(n)
            ]
            t3 = [
                sum(vxx[k] * bv[j, k] for k in range(n))
                for j in range(m)
            ]
            # Q_xx = l_xx + At @ T1;  Q_ux = l_ux + Bt @ T1 (cols over n);
            # Q_uxT = l_ux^T + At @ T3 (cols over m);  Q_uu = l_uu + Bt @ T3.
            qxx = [
                lxxv[j] + sum(atv[k] * t1[j][k] for k in range(n))
                for j in range(n)
            ]
            qux = [
                luxv[j] + sum(btv[k] * t1[j][k] for k in range(n))
                for j in range(n)
            ]
            quxt = [
                luxtv[j] + sum(atv[k] * t3[j][k] for k in range(n))
                for j in range(m)
            ]
            quu = [
                luuv[j] + sum(btv[k] * t3[j][k] for k in range(n))
                for j in range(m)
            ]
            # Q_x = l_x + At @ V_x;  Q_u = l_u + Bt @ V_x.
            qx = lxv + sum(atv[k] * vx[k] for k in range(n))
            qu = luv + sum(btv[k] * vx[k] for k in range(n))

            # Cholesky of Q_uu + reg I over lanes (unrolled, m tiny).
            # rsqrt + reciprocal-multiplies instead of sqrt + divides: the
            # m-deep factor chain and every solve's 2m-deep substitution
            # chains sit on the step's CRITICAL PATH (the recursion carry
            # serializes steps, and divides are the longest VPU ops in the
            # body); one reciprocal per pivot replaces 2m(n+1) divides.
            chol = [[None] * m for _ in range(m)]
            inv_diag = [None] * m
            for j in range(m):
                diag = quu[j][j] + reg_c
                for t in range(j):
                    diag = diag - chol[j][t] * chol[j][t]
                inv_ljj = jax.lax.rsqrt(diag)
                chol[j][j] = diag * inv_ljj  # = sqrt(diag)
                inv_diag[j] = inv_ljj
                for i in range(j + 1, m):
                    off = quu[j][i]  # Q_uu symmetric: [i, j] = cols[j][i]
                    for t in range(j):
                        off = off - chol[i][t] * chol[j][t]
                    chol[i][j] = off * inv_ljj

            def spd_solve(rhs_rows):  # rhs_rows: list of m lane rows
                ys = []
                for i in range(m):
                    acc = rhs_rows[i]
                    for t in range(i):
                        acc = acc - chol[i][t] * ys[t]
                    ys.append(acc * inv_diag[i])
                xs = [None] * m
                for i in reversed(range(m)):
                    acc = ys[i]
                    for t in range(i + 1, m):
                        acc = acc - chol[t][i] * xs[t]
                    xs[i] = acc * inv_diag[i]
                return xs

            # G[:, j] = solve(Q_ux[:, j]); g = solve(Q_u).
            g_cols = [spd_solve([qux[j][i] for i in range(m)]) for j in range(n)]
            g_u = spd_solve([qu[i] for i in range(m)])

            # Outputs: k = -g, K = -G (row-major (m, n) with batch lanes).
            k_out[tt] = -jnp.stack(g_u, axis=0)  # (m, B)
            for j in range(n):
                bigk_out[tt, :, j, :] = -jnp.stack(g_cols[j], axis=0)

            # Gt columns (n, B): Gt[:, t] = G[t, :].
            gt = [
                jnp.stack([g_cols[j][t] for j in range(n)], axis=0)
                for t in range(m)
            ]
            # V_x' = Q_x + Kt (Q_uu k + Q_u) + Q_uxT k  with k = -g.
            quu_k = [
                -sum(quu[t][i] * g_u[t] for t in range(m)) for i in range(m)
            ]  # rows of Q_uu @ k
            inner = [quu_k[i] + qu[i] for i in range(m)]
            vx_new = qx - sum(gt[t] * inner[t] for t in range(m)) - sum(
                quxt[t] * g_u[t] for t in range(m)
            )
            # V_xx' columns: qxx_j - sum_t Gt_t (qux_j[t] + reg * G_j[t]).
            for j in range(n):
                vxx_s[j] = qxx[j] - sum(
                    gt[t] * (qux[j][t] + reg_c * g_cols[j][t]) for t in range(m)
                )
            vx_s[...] = vx_new
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_btiles, n_hblocks)

    def tspec(c, r):
        return pl.BlockSpec(
            (block_t, c, r, tile_b),
            lambda ib, ih: (n_hblocks - 1 - ih, 0, 0, ib),
            memory_space=pltpu.VMEM,
        )

    def vspec(d):
        return pl.BlockSpec(
            (block_t, d, tile_b),
            lambda ib, ih: (n_hblocks - 1 - ih, 0, ib),
            memory_space=pltpu.VMEM,
        )

    term_vec = pl.BlockSpec((n, tile_b), lambda ib, ih: (0, ib), memory_space=pltpu.VMEM)
    term_mat = pl.BlockSpec((n, n, tile_b), lambda ib, ih: (0, 0, ib), memory_space=pltpu.VMEM)

    k_soa, bigk_soa = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tspec(n, n),  # a_cols
            tspec(n, n),  # at_cols
            tspec(m, n),  # b_cols
            tspec(n, m),  # bt_cols
            tspec(n, n),  # lxx_cols
            tspec(n, m),  # lux_cols
            tspec(m, n),  # luxt_cols
            tspec(m, m),  # luu_cols
            vspec(n),  # l_x
            vspec(m),  # l_u
            term_vec,  # v_x_final
            term_mat,  # v_xx_final
        ],
        out_specs=[
            vspec(m),  # k
            tspec(m, n),  # big K, (H, m, n, B)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, m, b_pad), dtype),
            jax.ShapeDtypeStruct((h_pad, m, n, b_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, tile_b), dtype),
            pltpu.VMEM((n, n, tile_b), dtype),
        ],
        interpret=interpret,
    )(
        a_cols, at_cols, b_cols, bt_cols, lxx_cols, lux_cols, luxt_cols,
        luu_cols, lx_v, lu_v, vxf, vxxf,
    )

    k_seq = jnp.transpose(k_soa, (2, 0, 1))[:batch, h_pad - horizon :]
    big_k_seq = jnp.transpose(bigk_soa, (3, 0, 1, 2))[:batch, h_pad - horizon :]
    return k_seq, big_k_seq


def make_tile_dot(dtype):
    """In-kernel dot with full-f32 passes.

    HIGHEST: default MXU precision is bf16 passes, which costs ~1.4e-3
    relative error over an H=100 recursion (measured vs the scan form);
    full-f32 passes on these tiny (<=12x12) dots are latency-free and bring
    the gap to scan-form level.
    """

    def dot(x, y):
        return jnp.dot(
            x, y,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    return dot


def riccati_step_tiles(a, at, b, bt, lx, lu, lxx, luu, lux, luxt, vx, vxx,
                       reg_c, dot):
    """One Riccati backward step on 2-D tiles (shared by the single-
    trajectory fused kernels; same update law as ``riccati_backward``).

    Shapes: a/at (n, n), b (n, m), bt (m, n), lx (1, n), lu (1, m),
    lxx (n, n), luu (m, m), lux (m, n), luxt (n, m), vx (1, n), vxx (n, n).
    Returns (g_u (m, 1), g_x (m, n), vx_new (1, n), vxx_new (n, n)) with
    gains k = -g_u[:, 0], K = -g_x.
    """
    m = luu.shape[0]

    t1 = dot(vxx, a)  # (n, n)
    t3 = dot(vxx, b)  # (n, m)
    qxx = lxx + dot(at, t1)
    qux = lux + dot(bt, t1)  # (m, n)
    quxt = luxt + dot(at, t3)  # (n, m)
    quu = luu + dot(bt, t3)  # (m, m)
    qx = lx + dot(vx, a)  # (1, n)
    qu = lu + dot(vx, b)  # (1, m)

    # Unrolled Cholesky of Q_uu + reg I; rows as (1, .) vectors. rsqrt +
    # reciprocal-multiplies (see the batched kernel): divides are the
    # longest chained ops on the recursion's critical path.
    chol = [[None] * m for _ in range(m)]
    inv_diag = [None] * m
    for j in range(m):
        diag = quu[j, j] + reg_c
        for s in range(j):
            diag = diag - chol[j][s] * chol[j][s]
        inv_ljj = jax.lax.rsqrt(diag)
        chol[j][j] = diag * inv_ljj  # = sqrt(diag)
        inv_diag[j] = inv_ljj
        for i2 in range(j + 1, m):
            off = quu[j, i2]  # symmetric
            for s in range(j):
                off = off - chol[i2][s] * chol[j][s]
            chol[i2][j] = off * inv_ljj

    # Solve (Q_uu + reg I) sol = [Q_u^T | Q_ux] row-wise over (1+n)
    # columns: rhs row i is a (1, 1+n) vector.
    rhs = jnp.concatenate([jnp.swapaxes(qu, 0, 1), qux], axis=1)  # (m, 1+n)
    ys = []
    for i2 in range(m):
        acc = rhs[i2 : i2 + 1, :]
        for s in range(i2):
            acc = acc - chol[i2][s] * ys[s]
        ys.append(acc * inv_diag[i2])
    xs = [None] * m
    for i2 in reversed(range(m)):
        acc = ys[i2]
        for s in range(i2 + 1, m):
            acc = acc - chol[s][i2] * xs[s]
        xs[i2] = acc * inv_diag[i2]
    sol = jnp.concatenate(xs, axis=0)  # (m, 1+n) = [g_u | G]
    g_u = sol[:, :1]  # (m, 1)
    g_x = sol[:, 1:]  # (m, n)

    # V' in the symmetric-by-construction form (see batched kernel):
    #   V_xx' = Q_xx - G'Q_ux - reg G'G
    #   V_x'  = Q_x + K'(Q_uu k + Q_u) + Q_ux' k,  K = -G, k = -g_u.
    gxt = jnp.swapaxes(g_x, 0, 1)  # (n, m)
    vxx_new = qxx - dot(gxt, qux) - reg_c * dot(gxt, g_x)
    inner = -dot(quu, g_u) + jnp.swapaxes(qu, 0, 1)  # (m, 1)
    vx_new = (
        qx
        - jnp.swapaxes(dot(gxt, inner), 0, 1)
        - jnp.swapaxes(dot(quxt, g_u), 0, 1)
    )
    return g_u, g_x, vx_new, vxx_new


def riccati_backward_fused_single(
    a_seq: jnp.ndarray,  # (H, n, n)
    b_seq: jnp.ndarray,  # (H, n, m)
    cost_exp: CostExpansion,  # fields (H, ...)
    v_x_final: jnp.ndarray,  # (n,)
    v_xx_final: jnp.ndarray,  # (n, n)
    reg: float = 1e-6,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-trajectory fused backward pass — the MPC-latency kernel.

    At MPC shapes the whole problem is tiny (H=100, n=12: ~170 KB of stage
    data), yet the `lax.scan` backward pass costs ~2.5 ms and the
    associative scan ~1.8 ms on a v5e — nearly all of it XLA while-loop
    per-step overhead and fusion-boundary traffic, not arithmetic. This
    kernel keeps EVERYTHING in VMEM and runs the recursion as one Pallas
    `fori_loop`: per step a handful of (n, n) MXU dots + an unrolled m x m
    Cholesky solve, with the (V_x, V_xx) carry in registers/VMEM values.

    Same update law as ``riccati_backward`` (see the batched kernel's
    docstring for the symmetric-by-construction V' form). Returns
    (k_seq (H, m), big_k_seq (H, m, n), v_x_seq (H+1, n),
    v_xx_seq (H+1, n, n)) — the full RiccatiResult payload (the value
    sequences cost one tiny extra VMEM store per step).
    """
    horizon, n, _ = a_seq.shape
    m = b_seq.shape[-1]
    dtype = a_seq.dtype
    reg_c = float(reg)

    # Per-block dots with pre-transposed operands. A "fewer, bigger dots"
    # variant (one stacked [A|B]' V [A|B] dot) was tried and REJECTED: the
    # q_all block slices carry vreg offset layouts that force relayouts
    # (and tripped Mosaic concat limitations), costing 5x compile time and
    # ~20% runtime vs this form.
    at_seq = jnp.swapaxes(a_seq, -1, -2)  # pre-transposed outside the kernel
    bt_seq = jnp.swapaxes(b_seq, -1, -2)
    luxt_seq = jnp.swapaxes(cost_exp.l_ux, -1, -2)

    def kernel(a_r, at_r, b_r, bt_r, lx_r, lu_r, lxx_r, luu_r, lux_r, luxt_r,
               vxf_r, vxxf_r, k_out, bigk_out, vx_out, vxx_out):

        vx_out[horizon] = vxf_r[0]
        vxx_out[horizon] = vxxf_r[...]
        dot = make_tile_dot(dtype)

        def step(i, carry):
            vx, vxx = carry  # (1, n), (n, n)
            t = horizon - 1 - i
            g_u, g_x, vx_new, vxx_new = riccati_step_tiles(
                a_r[t], at_r[t], b_r[t], bt_r[t],
                lx_r[t], lu_r[t], lxx_r[t], luu_r[t], lux_r[t], luxt_r[t],
                vx, vxx, reg_c, dot,
            )
            k_out[t] = -g_u[:, 0]
            bigk_out[t] = -g_x
            vx_out[t] = vx_new[0]
            vxx_out[t] = vxx_new
            return (vx_new, vxx_new)

        jax.lax.fori_loop(
            0, horizon, step, (vxf_r[...], vxxf_r[...])
        )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    k_seq, big_k_seq, v_x_seq, v_xx_seq = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((horizon, m), dtype),
            jax.ShapeDtypeStruct((horizon, m, n), dtype),
            jax.ShapeDtypeStruct((horizon + 1, n), dtype),
            jax.ShapeDtypeStruct((horizon + 1, n, n), dtype),
        ],
        in_specs=[vmem() for _ in range(12)],
        out_specs=[vmem() for _ in range(4)],
        interpret=interpret,
    )(
        a_seq, at_seq, b_seq, bt_seq,
        cost_exp.l_x[:, None, :], cost_exp.l_u[:, None, :],
        cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux, luxt_seq,
        v_x_final[None, :], v_xx_final,
    )
    return k_seq, big_k_seq, v_x_seq, v_xx_seq
