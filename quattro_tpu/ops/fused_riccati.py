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
import numpy as np

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


def riccati_backward_batched_fused2d(
    a_seq: jnp.ndarray,  # (B, H, n, n)
    b_seq: jnp.ndarray,  # (B, H, n, m)
    cost_exp: CostExpansion,  # fields (B, H, ...)
    v_x_final: jnp.ndarray,  # (B, n)
    v_xx_final: jnp.ndarray,  # (B, n, n)
    reg: float = 1e-6,
    interpret: bool = False,
    tile_s: int | None = None,
    block_t: int = 2,
    stream_dtype=None,
    packed_stage=None,
    horizon: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused batched backward pass, batch packed on sublanes AND lanes.

    The column-major kernel above (``riccati_backward_batched_fused``) keeps
    the batch on the 128-lane axis only, so every FMA runs on an
    (n, 128)-shaped tile: 2 vregs with 4/16 sublanes dead for n=12, and the
    whole Cholesky/solve chain on (1, 128) lane vectors at 1/8 sublane
    utilization. The r4 tile sweep pinned that kernel as VPU op-COUNT bound
    (BASELINE.md pod-scale notes), so this variant attacks the op count
    directly with a fully scalarized layout:

    - every ENTRY of every small matrix is its own (tile_s, 128) tile of
      ``tile_s * 128`` independent batch problems (tile_s=8 -> one full f32
      vreg, 100% utilization for every op in the body, Cholesky included);
    - transposed reads are FREE (index the (j, i) entry instead of (i, j))
      — the duplicated ``at/bt/luxt`` streams of the column-major layout
      disappear, nearly halving HBM traffic and input VMEM;
    - the body is written as SMALL-LEADING-AXIS tensor ops on
      (entries, tile_s, 128) arrays (one mul + one axis-0 reduction per
      contraction column) rather than fully unrolled scalar chains: Mosaic
      unrolls the leading axes into vreg ops internally, keeping the traced
      body ~200 equations — the fully unrolled form (~10k equations) did
      not finish Mosaic compilation in 9 minutes.

    Per step the body executes the raw FLOP count (~6.1k mul-adds for n=12,
    m=4) at full vreg width, vs ~1.65k partially-utilized vector ops per
    128 lanes in the column-major layout — a ~2.2x op-efficiency gain at
    tile_s=8. Same update law and semantics as the column-major kernel
    (quattro_ilqr_tf.py:297-317 contract via solver/riccati.py); V_xx'
    carries the same f32 near-symmetry as that kernel (columns computed
    independently; parity tests pin the band).

    ``tile_s`` defaults to ``min(8, ceil(batch / 128))`` — full vregs when
    the batch is wide enough, graceful degradation (partially-filled
    sublanes) below 1024. ``stream_dtype`` as in the column-major kernel:
    narrows the STAGE INPUT stream only (carry/arithmetic/outputs stay f32).

    ``packed_stage``: the seven stage tensors ALREADY in this kernel's
    packed layout ((nb * h_pad, entries, tile_s, 128), order (a, b, l_xx,
    l_uu, l_ux, l_x, l_u), horizon pre-padded) — as emitted by
    ``ops/fused_linquad.py::linquad_batched_fused``. Skips every host-side
    pad/pack transpose; ``a_seq/b_seq/cost_exp`` may be None, ``horizon``
    (the UNpadded horizon) is then required, and the batch (from
    ``v_x_final``) must be a multiple of ``tile_s * 128``.

    Returns (k_seq (B, H, m), big_k_seq (B, H, m, n)).
    """
    if packed_stage is not None:
        batch, n = v_x_final.shape
        dtype = v_x_final.dtype
        if tile_s is None:
            tile_s = max(1, min(8, -(-batch // _LANE)))
        chunk = tile_s * _LANE
        if batch % chunk:
            raise ValueError(
                f"packed_stage path needs batch % (tile_s*128) == 0 "
                f"(got batch={batch}, tile_s={tile_s})"
            )
        if horizon is None:
            raise ValueError("packed_stage path needs the unpadded horizon")
        return _fused2d_packed_call(
            packed_stage, v_x_final, v_xx_final, batch, horizon, n,
            reg, interpret, tile_s, block_t, stream_dtype,
        )
    batch, horizon, n, _ = a_seq.shape
    m = b_seq.shape[-1]
    dtype = a_seq.dtype
    if tile_s is None:
        tile_s = max(1, min(8, -(-batch // _LANE)))
    chunk = tile_s * _LANE

    # ---- pad batch to a chunk multiple; benign pad content ---------------
    b_pad = _round_up(max(batch, chunk), chunk)
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

    # Horizon pad: identity-dynamics zero-cost steps PREPENDED (they run
    # LAST in the reverse recursion and pass V through; see the column-major
    # kernel's rationale).
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

    nb = b_pad // chunk

    # ---- host-side packing: entries-as-tiles SoA -------------------------
    # (B, H, r, c) -> (nb * h_pad, r * c, tile_s, LANE): axis 0 is
    # batch-tile-major then time, axis 1 the flattened matrix entry
    # (row-major), last two the in-tile batch (b = ib*chunk + s*LANE + l).
    def pack(x):
        e = int(np.prod(x.shape[2:])) if x.ndim > 2 else 1
        xr = x.reshape(nb, tile_s, _LANE, h_pad, e)
        return jnp.transpose(xr, (0, 3, 4, 1, 2)).reshape(
            nb * h_pad, e, tile_s, _LANE
        )

    packed = (
        pack(a_seq), pack(b_seq), pack(cost_exp.l_xx), pack(cost_exp.l_uu),
        pack(cost_exp.l_ux), pack(cost_exp.l_x), pack(cost_exp.l_u),
    )
    k_seq, big_k_seq = _fused2d_packed_call(
        packed, v_x_final, v_xx_final, b_pad, horizon, n,
        reg, interpret, tile_s, block_t, stream_dtype,
    )
    return k_seq[:batch], big_k_seq[:batch]


def _fused2d_packed_call(
    packed_stage, v_x_final, v_xx_final, batch, horizon, n,
    reg, interpret, tile_s, block_t, stream_dtype,
):
    """Shared kernel driver: packed stage tensors in, (B, H) gains out."""
    dtype = v_x_final.dtype
    chunk = tile_s * _LANE
    nb = batch // chunk
    h_pad = packed_stage[0].shape[0] // nb
    if h_pad % block_t:
        raise ValueError(
            f"packed h_pad {h_pad} must be divisible by block_t {block_t}"
        )
    n_hblocks = h_pad // block_t
    m = packed_stage[6].shape[1]

    if stream_dtype is not None and jnp.dtype(stream_dtype) != jnp.dtype(dtype):
        narrow = lambda x: x.astype(stream_dtype)
    else:
        stream_dtype = None
        narrow = lambda x: x
    a_pk, b_pk, lxx_pk, luu_pk, lux_pk, lx_pk, lu_pk = (
        narrow(x) for x in packed_stage
    )
    def pack_term(x):  # (B, e...) -> (nb * e, tile_s, LANE), carry dtype
        e = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        xr = x.reshape(nb, tile_s, _LANE, e)
        return jnp.transpose(xr, (0, 3, 1, 2)).reshape(nb * e, tile_s, _LANE)

    vxf_pk = pack_term(v_x_final)
    vxxf_pk = pack_term(v_xx_final)
    reg_c = float(reg)

    def kernel(a_r, b_r, lxx_r, luu_r, lux_r, lx_r, lu_r, vxf_r, vxxf_r,
               k_out, bigk_out, vx_s, vxx_s):
        from jax.experimental import pallas as pl

        @pl.when(pl.program_id(1) == 0)
        def _init():
            vx_s[...] = vxf_r[...]
            vxx_s[...] = vxxf_r[...]

        up = (lambda x: x.astype(dtype)) if stream_dtype is not None else (
            lambda x: x)

        def step(i, _):
            tt = block_t - 1 - i
            # Leading-axis tensor views; tile dims (tile_s, LANE) trailing.
            A = up(a_r[tt]).reshape(n, n, tile_s, _LANE)      # [row k][col j]
            Bm = up(b_r[tt]).reshape(n, m, tile_s, _LANE)
            Lxx = up(lxx_r[tt]).reshape(n, n, tile_s, _LANE)
            Luu = up(luu_r[tt]).reshape(m, m, tile_s, _LANE)
            Lux = up(lux_r[tt]).reshape(m, n, tile_s, _LANE)
            lx = up(lx_r[tt])                                  # (n, S, L)
            lu = up(lu_r[tt])                                  # (m, S, L)
            vx = vx_s[...]                                     # (n, S, L)
            vxx = vxx_s[...].reshape(n, n, tile_s, _LANE)

            def red(x_stack, y_cols, init=None):
                """``init + sum_k x_stack[k] * y_cols[k]`` over the leading
                axis, as an explicit multiply-add CHAIN: ``a * b + acc`` is
                the vreg MAC pattern (one fused op per term), where the
                mul-everything-then-tree-``jnp.sum`` form measured ~1
                vector-op/cycle (separate mul and add issue slots). Costs
                ~2n traced equations per contraction instead of 2 — the
                traced body lands at ~700 equations, still ~3 min of Mosaic
                compile (the fully scalarized form at ~10k equations never
                finished)."""
                acc = x_stack[0] * y_cols[0] if init is None else (
                    x_stack[0] * y_cols[0] + init)
                for k2 in range(1, x_stack.shape[0]):
                    acc = x_stack[k2] * y_cols[k2] + acc
                return acc

            # T1 = Vxx @ A (n, n), T3 = Vxx @ B (n, m): column-at-a-time so
            # no (n^3)-tile intermediate materializes.
            # INDEX ORDER NOTE: each contraction runs over the LEADING axis
            # of both operands, so t1[r, c] = sum_k vxx[k, r] A[k, c] —
            # correct because the V_xx carry is stored symmetrized (see the
            # V' update below).
            t1 = jnp.stack(
                [red(vxx, A[:, c][:, None]) for c in range(n)], axis=1
            )  # t1[r, c]
            t3 = jnp.stack(
                [red(vxx, Bm[:, c][:, None]) for c in range(m)], axis=1
            )

            # Q-expansion (quattro_ilqr_tf.py:297-301). Transposed reads are
            # leading-axis indexing — free.
            # Q_xx = l_xx + A' T1; Q_ux = l_ux + B' T1; Q_uu = l_uu + B' T3.
            qxx = jnp.stack(
                [red(A, t1[:, c][:, None], Lxx[:, c]) for c in range(n)],
                axis=1,
            )
            qux = jnp.stack(
                [red(Bm, t1[:, c][:, None], Lux[:, c]) for c in range(n)],
                axis=1,
            )  # (m, n): qux[t, c] = l_ux[t, c] + sum_k B[k, t] t1[k, c]
            quu = jnp.stack(
                [red(Bm, t3[:, c][:, None], Luu[:, c]) for c in range(m)],
                axis=1,
            )
            qx = red(A, vx[:, None], lx)
            qu = red(Bm, vx[:, None], lu)

            # Cholesky of Q_uu + reg I — full-tile ops, rsqrt critical path
            # (see the column-major kernel's rationale).
            chol = [[None] * m for _ in range(m)]
            inv_diag = [None] * m
            for j in range(m):
                diag = quu[j, j] + reg_c
                for t in range(j):
                    diag = diag - chol[j][t] * chol[j][t]
                inv_ljj = jax.lax.rsqrt(diag)
                chol[j][j] = diag * inv_ljj
                inv_diag[j] = inv_ljj
                for i2 in range(j + 1, m):
                    off = quu[j, i2]  # symmetric
                    for t in range(j):
                        off = off - chol[i2][t] * chol[j][t]
                    chol[i2][j] = off * inv_ljj

            # One batched solve over all 1 + n right-hand sides: rows are
            # (1 + n, S, L) values, the triangular chain ops broadcast the
            # (S, L) Cholesky entries over the rhs axis.
            rhs = jnp.concatenate([qu[:, None], qux], axis=1)  # (m, 1+n, S, L)
            ys = []
            for i2 in range(m):
                acc = rhs[i2]
                for t in range(i2):
                    acc = acc - chol[i2][t][None] * ys[t]
                ys.append(acc * inv_diag[i2][None])
            xs = [None] * m
            for i2 in reversed(range(m)):
                acc = ys[i2]
                for t in range(i2 + 1, m):
                    acc = acc - chol[t][i2][None] * xs[t]
                xs[i2] = acc * inv_diag[i2][None]
            sol = jnp.stack(xs, axis=0)  # (m, 1+n, S, L) = [g_u | G]
            g_u = sol[:, 0]  # (m, S, L)
            gx = sol[:, 1:]  # (m, n, S, L)

            # Outputs k = -g, K = -G.
            k_out[tt] = -g_u
            bigk_out[tt] = -gx.reshape(m * n, tile_s, _LANE)

            # V_x' = Q_x + K'(Q_uu k + Q_u) + Q_ux' k, k = -g_u:
            inner = qu - red(quu, g_u[:, None])  # (m, S, L); quu symmetric
            vx_new = qx - red(gx, inner[:, None]) - red(qux, g_u[:, None])
            # V_xx' = Q_xx - G' Q_ux - reg G' G; symmetrize the stored carry
            # (costs n^2 tiles of add+mul) so the t1/t3 contractions above
            # may exploit symmetry exactly.
            w = qux + reg_c * gx  # (m, n, S, L)
            vxx_new = qxx - jnp.stack(
                [red(gx, w[:, c][:, None]) for c in range(n)], axis=1
            )
            vxx_sym = 0.5 * (vxx_new + vxx_new.transpose(1, 0, 2, 3))
            vx_s[...] = vx_new
            vxx_s[...] = vxx_sym.reshape(n * n, tile_s, _LANE)
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (nb, n_hblocks)

    def sspec(e):  # per-stage tensors: (nb * h_pad, e, tile_s, LANE)
        return pl.BlockSpec(
            (block_t, e, tile_s, _LANE),
            lambda ib, ih: (ib * n_hblocks + n_hblocks - 1 - ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tspec(e):  # terminal tensors: (nb * e, tile_s, LANE)
        return pl.BlockSpec(
            (e, tile_s, _LANE), lambda ib, ih: (ib, 0, 0),
            memory_space=pltpu.VMEM,
        )

    k_pk, bigk_pk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            sspec(n * n),  # a
            sspec(n * m),  # b
            sspec(n * n),  # lxx
            sspec(m * m),  # luu
            sspec(m * n),  # lux
            sspec(n),  # lx
            sspec(m),  # lu
            tspec(n),  # v_x_final
            tspec(n * n),  # v_xx_final
        ],
        out_specs=[
            sspec(m),  # k
            sspec(m * n),  # big K
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * h_pad, m, tile_s, _LANE), dtype),
            jax.ShapeDtypeStruct((nb * h_pad, m * n, tile_s, _LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, tile_s, _LANE), dtype),
            pltpu.VMEM((n * n, tile_s, _LANE), dtype),
        ],
        interpret=interpret,
    )(
        a_pk, b_pk, lxx_pk, luu_pk, lux_pk, lx_pk, lu_pk, vxf_pk, vxxf_pk,
    )

    # Unpack: (nb * h_pad, e, tile_s, LANE) -> (B, H, ...).
    def unpack(x, shape_tail):
        e = x.shape[1]
        xr = x.reshape(nb, h_pad, e, tile_s, _LANE)
        out = jnp.transpose(xr, (0, 3, 4, 1, 2)).reshape(batch, h_pad, e)
        return out[:, h_pad - horizon:].reshape(
            (batch, horizon) + shape_tail
        )

    return unpack(k_pk, (m,)), unpack(bigk_pk, (m, n))


def riccati_backward_batched_fused_auto(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    interpret: bool = False,
    stream_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Width-dispatched fused batched backward pass.

    Picks the batch2d kernel (``riccati_backward_batched_fused2d``) when the
    trajectory batch is wide enough to fill its (8, 128) per-entry tiles
    without excessive padding — measured 1.3-1.7x over the column-major
    kernel at B >= 1024 on a v5e (benchmarks/tile_sweep_tpu.json) — and the
    column-major kernel otherwise. Mosaic only compiles the batch2d form in
    reasonable time at full-vreg tile_s (8 f32 / 16 bf16-stream); sub-vreg
    tile_s is an interpret-mode/test-only configuration, which is why the
    dispatch keys on width rather than always preferring batch2d.
    """
    batch = a_seq.shape[0]
    chunk = 8 * _LANE
    pad_waste = (-(-batch // chunk) * chunk) / batch
    if batch >= chunk and pad_waste <= 1.25:
        return riccati_backward_batched_fused2d(
            a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg,
            interpret=interpret, tile_s=8,
            block_t=4 if stream_dtype is not None else 2,
            stream_dtype=stream_dtype,
        )
    return riccati_backward_batched_fused(
        a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg,
        interpret=interpret, stream_dtype=stream_dtype,
    )


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
