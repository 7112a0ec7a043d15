"""Riccati backward passes: sequential scan and associative-scan parallel form.

The trajectory KKT system of an LQ subproblem is block-tridiagonal; the
backward Riccati recursion is its structured factorization. The reference
implements it as a Python loop with explicit ``np.linalg.inv``
(quattro_ilqr_tf/quattro_ilqr_tf.py:281-319). Here it is built twice:

1. ``riccati_backward`` — a ``lax.scan`` with the *exact* reference update law
   (Q-expansion :297-301, Tikhonov 1e-6 regularization on Q_uu :304-305,
   gains :308-309, value recursion including cross terms :315-316,
   V_xx symmetrization :317). O(H) depth, used for parity and short horizons.

2. ``riccati_backward_associative`` — the LQR backward recursion is the
   composition of affine value-function maps, which is associative. Each stage
   becomes a 5-tuple element (A, b, C, eta, J) a la Särkkä & García-Fernández,
   "Temporal Parallelization of Dynamic Programming" (arXiv:1905.13002; see
   PAPERS.md parallel-Riccati references), combined with
   ``jax.lax.associative_scan`` in O(log H) depth. This is the horizon-axis
   ("sequence-parallel") factorization that partitions across a TPU mesh.

Cross control-state terms (l_ux) and linear control cost (l_u) are handled in
the parallel form by exact pre-elimination of the control (see
``_stage_elements``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from quattro_tpu.ops.smallchol import batched_spd_solve
from quattro_tpu.ops.smalllu import lu_solve, unrolled_lu
from quattro_tpu.solver.derivatives import CostExpansion


class RiccatiResult(NamedTuple):
    k_seq: jnp.ndarray  # (H, m) feedforward
    big_k_seq: jnp.ndarray  # (H, m, n) feedback gains
    v_x_seq: jnp.ndarray  # (H+1, n) value gradients, v_x_seq[t] = V_x at step t
    v_xx_seq: jnp.ndarray  # (H+1, n, n) value Hessians


def _q_expansion(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx):
    """One-step Q expansion (quattro_ilqr_tf.py:297-301)."""
    q_x = l_x + a.T @ v_x
    q_u = l_u + b.T @ v_x
    q_xx = l_xx + a.T @ v_xx @ a
    q_ux = l_ux + b.T @ v_xx @ a
    q_uu = l_uu + b.T @ v_xx @ b
    return q_x, q_u, q_xx, q_ux, q_uu


def _gains_and_value(q_x, q_u, q_xx, q_ux, q_uu, reg, use_chol: bool = True):
    """Gains from regularized Q_uu; value update with *unregularized* Q_uu.

    Matches the reference exactly: regularization only enters the solve
    (quattro_ilqr_tf.py:304-309) while the cost-to-go update uses raw Q_uu
    (:315-316), followed by symmetrization (:317). Solves instead of forming
    the reference's explicit inverse (a quirk not to replicate, SURVEY.md
    §7.8); ``use_chol`` picks the unrolled small-matrix Cholesky (VPU-lane
    code, SPD-only) over LU.
    """
    m = q_uu.shape[0]
    q_uu_reg = q_uu + reg * jnp.eye(m, dtype=q_uu.dtype)
    rhs = jnp.concatenate([q_u[:, None], q_ux], axis=1)  # (m, 1+n)
    solve = batched_spd_solve if use_chol else jnp.linalg.solve
    sol = -solve(q_uu_reg, rhs)
    k = sol[:, 0]
    big_k = sol[:, 1:]

    v_x = q_x + big_k.T @ q_uu @ k + big_k.T @ q_u + q_ux.T @ k
    v_xx = q_xx + big_k.T @ q_uu @ big_k + big_k.T @ q_ux + q_ux.T @ big_k
    v_xx = 0.5 * (v_xx + v_xx.T)
    return k, big_k, v_x, v_xx


def riccati_backward(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    use_chol: bool = True,
) -> RiccatiResult:
    """Sequential (scan) backward Riccati over the full horizon.

    Semantics: quattro_ilqr_tf.py:281-319, vectorized into one ``lax.scan``.
    """

    def step(carry, inp):
        v_x, v_xx = carry
        a, b, l_x, l_u, l_xx, l_uu, l_ux = inp
        q = _q_expansion(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx)
        k, big_k, v_x_new, v_xx_new = _gains_and_value(*q, reg, use_chol)
        return (v_x_new, v_xx_new), (k, big_k, v_x_new, v_xx_new)

    inputs = (a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux)
    (_, _), (k_seq, big_k_seq, v_x_hist, v_xx_hist) = jax.lax.scan(
        step, (v_x_final, v_xx_final), inputs, reverse=True
    )
    v_x_seq = jnp.concatenate([v_x_hist, v_x_final[None]], axis=0)
    v_xx_seq = jnp.concatenate([v_xx_hist, v_xx_final[None]], axis=0)
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)


def riccati_backward_segment(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    window: int,
    reg: float = 1e-6,
    use_chol: bool = True,
) -> RiccatiResult:
    """Backward Riccati over only the LAST ``window`` steps of the horizon.

    The exact tail used as the transformer prompt
    (quattro_ilqr_tf.py:326-366; always seeded from the terminal cost, which
    is correct because the segment ends at the terminal state —
    SURVEY.md §7.8). ``window`` must be static under jit.
    """
    sl = slice(-window, None)
    tail_exp = CostExpansion(
        cost_exp.l_x[sl],
        cost_exp.l_u[sl],
        cost_exp.l_xx[sl],
        cost_exp.l_uu[sl],
        cost_exp.l_ux[sl],
    )
    return riccati_backward(a_seq[sl], b_seq[sl], tail_exp, v_x_final, v_xx_final, reg, use_chol)


# ---------------------------------------------------------------------------
# Associative-scan parallel Riccati
# ---------------------------------------------------------------------------


class ValueElement(NamedTuple):
    """Conditional value-function element V_{t->s}(x_t, x_s).

    Parameterized as in Särkkä & García-Fernández (arXiv:1905.13002):
    ``V(x, z) = 0.5 (z - A x - b)' C^+ (z - A x - b) - eta' x + 0.5 x' J x``.
    Composition of two adjacent elements is associative and never inverts C.
    All fields carry a leading horizon axis when stacked.
    """

    a: jnp.ndarray  # (n, n)
    b: jnp.ndarray  # (n,)
    c: jnp.ndarray  # (n, n) control-induced covariance B R^{-1} B'
    eta: jnp.ndarray  # (n,)
    j: jnp.ndarray  # (n, n)


def _combine(earlier: ValueElement, later: ValueElement) -> ValueElement:
    """Compose element over [t,s) with element over [s,r) -> element over [t,r).

    Batched over arbitrary leading axes (``jax.lax.associative_scan`` invokes
    the operator on stacked element slices). Both needed inverses —
    (I + C1 J2)^{-1} and its transpose (I + J2 C1)^{-1}, equal by symmetry of
    C and J — come from ONE unrolled LU factorization
    (``ops/smalllu.py``; XLA's pivoting batched LU is 2.5-5x slower on TPU
    for these n <= 16 blocks, benchmarks/results_tpu.json). Skipping pivoting
    is empirically validated rather than proved: spec(I + C1 J2) =
    1 + eig(C1^{1/2} J2 C1^{1/2}) >= 1 bounds the eigenvalues for PSD C, J,
    which is well-conditioned in practice but does not bound no-pivot LU
    pivot growth for this nonsymmetric product; the guard is the pinned
    accuracy-vs-pivoted-LU parity tests (tests/test_ops.py) and the golden
    solve tests on both flagship systems.
    """
    a1, b1, c1, eta1, j1 = earlier
    a2, b2, c2, eta2, j2 = later
    n = a1.shape[-1]
    eye = jnp.eye(n, dtype=a1.dtype)

    def tr(x):
        return jnp.swapaxes(x, -1, -2)

    def mv(mat, vec):
        return jnp.einsum("...ij,...j->...i", mat, vec)

    lhs = eye + c1 @ j2  # (I + C1 J2)
    factors = unrolled_lu(lhs)

    # (I + C1 J2)^{-1} [...]: columns = [A1 | (b1 + C1 eta2) | C1].
    rhs = jnp.concatenate([a1, (b1 + mv(c1, eta2))[..., None], c1], axis=-1)
    sol = lu_solve(factors, rhs, transpose=False)
    m_a1 = sol[..., :n]
    m_bc = sol[..., n]
    m_c1 = sol[..., n + 1 :]

    # (I + J2 C1)^{-1} [...] = solve(lhs^T, [...]): columns = [(eta2 - J2 b1) | J2 A1].
    rhs_t = jnp.concatenate([(eta2 - mv(j2, b1))[..., None], j2 @ a1], axis=-1)
    sol_t = lu_solve(factors, rhs_t, transpose=True)
    mt_eta = sol_t[..., 0]
    mt_j_a1 = sol_t[..., 1:]

    return ValueElement(
        a=a2 @ m_a1,
        b=mv(a2, m_bc) + b2,
        c=a2 @ m_c1 @ tr(a2) + c2,
        eta=mv(tr(a1), mt_eta) + eta1,
        j=tr(a1) @ mt_j_a1 + j1,
    )


def _stage_elements(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    reg: float,
) -> ValueElement:
    """Build per-stage value elements, eliminating cross terms and linear
    control cost exactly.

    With stage cost ``l_x'dx + l_u'du + .5 dx'l_xx dx + .5 du'l_uu du +
    du'l_ux dx`` and dynamics ``dx+ = A dx + B du``, substituting
    ``du = dw - l_uu^{-1}(l_ux dx + l_u)`` yields an equivalent LQT stage with

        A~   = A - B l_uu^{-1} l_ux
        b~   = -B l_uu^{-1} l_u
        C~   = B l_uu^{-1} B'
        eta~ = -(l_x - l_ux' l_uu^{-1} l_u)
        J~   = l_xx - l_ux' l_uu^{-1} l_ux

    (sign convention: element value carries ``-eta'x + .5 x'J x``).
    l_uu is regularized here (vs. Q_uu in the sequential form); for reg ~1e-6
    the difference is far below solver tolerance (verified by tests).
    """

    def make(a, b, l_x, l_u, l_xx, l_uu, l_ux):
        m = l_uu.shape[0]
        l_uu_reg = l_uu + reg * jnp.eye(m, dtype=l_uu.dtype)
        # Solve l_uu^{-1} [l_u | l_ux | B'] in one factorization (SPD, m small).
        rhs = jnp.concatenate([l_u[:, None], l_ux, b.T], axis=1)  # (m, 1+n+n)
        sol = batched_spd_solve(l_uu_reg, rhs)
        luu_inv_lu = sol[:, 0]
        luu_inv_lux = sol[:, 1 : 1 + l_ux.shape[1]]
        luu_inv_bt = sol[:, 1 + l_ux.shape[1] :]
        return ValueElement(
            a=a - b @ luu_inv_lux,
            b=-b @ luu_inv_lu,
            c=b @ luu_inv_bt,
            eta=-(l_x - l_ux.T @ luu_inv_lu),
            j=l_xx - l_ux.T @ luu_inv_lux,
        )

    return jax.vmap(make)(
        a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux
    )


def _stage_elements_with_factors(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    reg: float,
) -> Tuple[ValueElement, jnp.ndarray, jnp.ndarray]:
    """``_stage_elements`` plus the low-rank factor of each stage's C.

    Every stage's control-induced covariance is rank-m: ``C = B W B'`` with
    ``W = (l_uu + reg I)^{-1}``. Returns ``(elements, b_seq, P)`` with
    ``P[t] = W B' (m, n)`` so that ``C[t] = b_seq[t] @ P[t]`` — the factor
    the Woodbury-structured fold (`_combine_stage_acc`) needs.
    """

    def make(a, b, l_x, l_u, l_xx, l_uu, l_ux):
        m = l_uu.shape[0]
        l_uu_reg = l_uu + reg * jnp.eye(m, dtype=l_uu.dtype)
        rhs = jnp.concatenate([l_u[:, None], l_ux, b.T], axis=1)
        sol = batched_spd_solve(l_uu_reg, rhs)
        luu_inv_lu = sol[:, 0]
        luu_inv_lux = sol[:, 1 : 1 + l_ux.shape[1]]
        luu_inv_bt = sol[:, 1 + l_ux.shape[1] :]
        elem = ValueElement(
            a=a - b @ luu_inv_lux,
            b=-b @ luu_inv_lu,
            c=b @ luu_inv_bt,
            eta=-(l_x - l_ux.T @ luu_inv_lu),
            j=l_xx - l_ux.T @ luu_inv_lux,
        )
        return elem, luu_inv_bt

    elems, p = jax.vmap(make)(
        a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx,
        cost_exp.l_uu, cost_exp.l_ux,
    )
    return elems, b_seq, p


def _combine_stage_acc(
    stage: ValueElement,
    b_mat: jnp.ndarray,  # (n, m): the stage's dynamics B
    p_mat: jnp.ndarray,  # (m, n): W B' with W = (l_uu + reg I)^{-1}
    acc: ValueElement,
) -> ValueElement:
    """``_combine(stage, acc)`` exploiting the stage's rank-m C = B P.

    The generic combine's two n x n no-pivot LU solves become ONE m x m
    factorization via Woodbury: with ``lhs = I + C1 J2 = I + B P J2``,

        lhs^{-1} X   = X - B S^{-1} P J2 X,      S = I_m + P J2 B
        lhs^{-T} v   = v - (J2 B) S^{-1} P v
        lhs^{-1} C1  = B S^{-1} P                (since P J2 B = S - I)

    For n=12, m=4 this cuts the fold's per-step cost to ~2x a plain Riccati
    step (3 n^3 products + O(n^2 m)) and — the part that matters on-device
    — replaces the 12-deep unrolled-LU chain with a 4-deep one. Exact
    algebra: equality with ``_combine`` is pinned by tests/test_riccati.py.
    """
    a1, b1, _, eta1, j1 = stage
    a2, b2, c2, eta2, j2 = acc
    m = p_mat.shape[-2]
    eye_m = jnp.eye(m, dtype=a1.dtype)

    def tr(x):
        return jnp.swapaxes(x, -1, -2)

    def mv(mat, vec):
        return jnp.einsum("...ij,...j->...i", mat, vec)

    y = j2 @ b_mat  # (n, m)
    s = eye_m + p_mat @ y  # (m, m)
    sf = unrolled_lu(s)
    j2a1 = j2 @ a1  # (n, n)
    z = lu_solve(sf, p_mat @ j2a1, transpose=False)  # (m, n)
    m_a1 = a1 - b_mat @ z
    mt_j_a1 = j2a1 - y @ z

    v_bc = b1 + mv(b_mat, mv(p_mat, eta2))  # b1 + C1 eta2
    m_bc = v_bc - mv(
        b_mat,
        lu_solve(sf, p_mat @ mv(j2, v_bc)[..., None], transpose=False)[..., 0],
    )
    v2 = eta2 - mv(j2, b1)
    mt_eta = v2 - mv(y, lu_solve(sf, mv(p_mat, v2)[..., None], transpose=False)[..., 0])

    u = a2 @ b_mat  # (n, m)
    vt = p_mat @ tr(a2)  # (m, n)
    return ValueElement(
        a=a2 @ m_a1,
        b=mv(a2, m_bc) + b2,
        c=u @ lu_solve(sf, vt, transpose=False) + c2,
        eta=mv(tr(a1), mt_eta) + eta1,
        j=tr(a1) @ mt_j_a1 + j1,
    )


def _terminal_element(v_x_final: jnp.ndarray, v_xx_final: jnp.ndarray) -> ValueElement:
    n = v_x_final.shape[0]
    zeros_m = jnp.zeros((n, n), dtype=v_x_final.dtype)
    return ValueElement(
        a=zeros_m,
        b=jnp.zeros_like(v_x_final),
        c=zeros_m,
        eta=-v_x_final,
        j=v_xx_final,
    )


def suffix_value_functions(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All value functions (V_x[t], V_xx[t]) for t = 0..H via associative scan.

    O(log H) depth; each combine is a batch of n x n solves + matmuls that XLA
    tiles onto the MXU. Returns arrays of shape (H+1, n) and (H+1, n, n).
    """
    stage = _stage_elements(a_seq, b_seq, cost_exp, reg)
    term = _terminal_element(v_x_final, v_xx_final)
    elems = ValueElement(*(jnp.concatenate([s, t[None]], axis=0) for s, t in zip(stage, term)))

    # Suffix-inclusive scan: result[t] = elem[t] (.) elem[t+1] (.) ... (.) elem[H]
    # with (.) = _combine(earlier, later). associative_scan(reverse=True)
    # internally flips the array and runs a forward scan, so its operator
    # receives (later-in-time, earlier-in-time) operands — swap them back into
    # _combine's (earlier, later) signature.
    suffix = jax.lax.associative_scan(lambda a, b: _combine(b, a), elems, reverse=True)
    return -suffix.eta, suffix.j


def riccati_backward_associative(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    use_chol: bool = True,
) -> RiccatiResult:
    """Parallel (associative-scan) backward Riccati.

    Equivalent to ``riccati_backward`` up to regularization placement
    (tested to tight tolerance on random LQ problems). The gain extraction is
    an embarrassingly parallel vmap over the horizon once all suffix value
    functions are known.
    """
    v_x_seq, v_xx_seq = suffix_value_functions(
        a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg
    )

    def gains(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx):
        q = _q_expansion(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx)
        k, big_k, _, _ = _gains_and_value(*q, reg, use_chol)
        return k, big_k

    k_seq, big_k_seq = jax.vmap(gains)(
        a_seq,
        b_seq,
        cost_exp.l_x,
        cost_exp.l_u,
        cost_exp.l_xx,
        cost_exp.l_uu,
        cost_exp.l_ux,
        v_x_seq[1:],
        v_xx_seq[1:],
    )
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)


def riccati_backward_auto(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    use_chol: bool = True,
    batch_size: int = 1,
    latency_crossover_h: int = 16,
) -> RiccatiResult:
    """Pick the faster backward-pass form for the workload shape.

    Measured on a v5e chip (benchmarks/results_tpu.json, n=12, m=4):

    - **Batched** (traj >= ~8): the vmapped sequential scan wins outright —
      the batch axis already fills the MXU, so O(log H) depth buys nothing
      and the element combines cost ~12x more arithmetic (25 ms vs 286 ms
      at batch 64, H=1024).
    - **Single-trajectory**: the associative scan's log-depth wins at every
      measured horizon (H=30: 1.56 vs 1.69 ms ... H=1024: 3.8 vs 14.2 ms).

    ``batch_size`` is the caller's trajectory-batch width (static under jit);
    the horizon comes from ``a_seq``.
    """
    horizon = a_seq.shape[0]
    if batch_size == 1 and horizon >= latency_crossover_h:
        return riccati_backward_associative(
            a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg, use_chol
        )
    return riccati_backward(a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg, use_chol)


def riccati_backward_fused(
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    use_chol: bool = True,
) -> RiccatiResult:
    """Single-trajectory fused Pallas backward pass (the MPC-latency kernel).

    The whole recursion runs as one VMEM-resident kernel
    (ops/fused_riccati.py::riccati_backward_fused_single) — measured 1.33x
    over the associative scan at H=100 and 1.59x at H=1024 on a v5e (the
    scan forms are XLA-loop-overhead-bound at these tiny shapes). Same
    update law and full RiccatiResult payload. ``use_chol`` is accepted for
    signature parity (the kernel's solve is always the unrolled Cholesky);
    ``reg`` must be static (baked into the kernel). Off-TPU the kernel runs
    in interpret mode (correct but slow — meant for tests).

    Select via ``ILQRConfig(riccati="fused")``. Not the "auto" default: the
    kernel costs ~5 min of Mosaic compile per shape (amortized by the
    persistent compilation cache), which is the wrong default for
    interactive use.
    """
    from quattro_tpu.ops.fused_riccati import riccati_backward_fused_single

    interpret = jax.default_backend() != "tpu"
    k_seq, big_k_seq, v_x_seq, v_xx_seq = riccati_backward_fused_single(
        a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg, interpret=interpret
    )
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)
