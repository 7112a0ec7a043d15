"""Fused batched Riccati backward kernel vs the vmapped sequential scan.

The kernel must reproduce `riccati_backward`'s gains exactly (same update
law, same regularization placement) on random LQ problems, including the
batch-padding and horizon-padding paths. Interpret mode (CPU); the Mosaic
lowering is exercised by benchmarks/suite.py on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused
from quattro_tpu.solver.derivatives import CostExpansion
from quattro_tpu.solver.riccati import riccati_backward


def _random_problem(batch, horizon, n, m, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 9)
    sh = (batch, horizon)
    a = jnp.eye(n, dtype=dtype) + 0.1 * jax.random.normal(ks[0], (*sh, n, n), dtype)
    b = 0.3 * jax.random.normal(ks[1], (*sh, n, m), dtype)
    w = jax.random.normal(ks[2], (*sh, n, n), dtype)
    wu = jax.random.normal(ks[3], (*sh, m, m), dtype)
    exp = CostExpansion(
        l_x=jax.random.normal(ks[4], (*sh, n), dtype),
        l_u=jax.random.normal(ks[5], (*sh, m), dtype),
        l_xx=0.3 * jnp.einsum("...ij,...kj->...ik", w, w) + 0.2 * jnp.eye(n, dtype=dtype),
        l_uu=jnp.einsum("...ij,...kj->...ik", wu, wu) + 0.5 * jnp.eye(m, dtype=dtype),
        l_ux=0.1 * jax.random.normal(ks[6], (*sh, m, n), dtype),
    )
    wf = jax.random.normal(ks[7], (batch, n, n), dtype)
    v_xx = jnp.einsum("bij,bkj->bik", wf, wf) + jnp.eye(n, dtype=dtype)
    v_x = jax.random.normal(ks[8], (batch, n), dtype)
    return a, b, exp, v_x, v_xx


def _oracle(a, b, exp, v_x, v_xx, reg):
    res = jax.vmap(
        lambda aa, bb, ee, vx, vxx: riccati_backward(aa, bb, ee, vx, vxx, reg)
    )(a, b, exp, v_x, v_xx)
    return res.k_seq, res.big_k_seq


@pytest.mark.parametrize(
    "batch,horizon,n,m,block_t",
    [
        (5, 16, 3, 2, 8),  # batch pad to 128, exact horizon blocks
        (4, 13, 4, 1, 8),  # horizon pad 13 -> 16, m=1
        (3, 12, 12, 4, 4),  # flagship dims
    ],
)
def test_fused_matches_vmapped_scan_f64(batch, horizon, n, m, block_t):
    a, b, exp, v_x, v_xx = _random_problem(batch, horizon, n, m, jnp.float64)
    reg = 1e-6
    k_ref, big_k_ref = _oracle(a, b, exp, v_x, v_xx, reg)
    k, big_k = riccati_backward_batched_fused(
        a, b, exp, v_x, v_xx, reg, interpret=True, block_t=block_t
    )
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(big_k), np.asarray(big_k_ref), rtol=1e-9, atol=1e-9)


def test_fused_matches_vmapped_scan_f32():
    a, b, exp, v_x, v_xx = _random_problem(6, 24, 12, 4, jnp.float32, seed=3)
    reg = 1e-6
    k_ref, big_k_ref = _oracle(a, b, exp, v_x, v_xx, reg)
    k, big_k = riccati_backward_batched_fused(a, b, exp, v_x, v_xx, reg, interpret=True)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(big_k), np.asarray(big_k_ref), rtol=2e-4, atol=2e-4)


def test_fused_batched_solve_matches_vmapped_solve():
    """The explicitly-batched iLQR loop around the fused kernel must
    reproduce `vmap(ilqr_solve)` — same masking semantics, same accepted
    steps, same per-lane iteration counts (f64 => fp noise ~1e-12, so the
    line-search decisions are identical)."""
    from quattro_tpu.parallel.batch import _batched_ilqr_solve_fused, batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    key = jax.random.PRNGKey(0)
    x0s = 0.3 * jax.random.normal(key, (6, 4), dtype=jnp.float64)
    u0s = jnp.zeros((6, 20, 1), dtype=jnp.float64)
    config = ILQRConfig(tol=1e-1, max_iter=12)

    ref = batched_ilqr_solve(dyn, cost, fcost, x0s, u0s, config, riccati_backend="vmap")
    got = _batched_ilqr_solve_fused(dyn, cost, fcost, x0s, u0s, config, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.iterations), np.asarray(ref.iterations))
    np.testing.assert_array_equal(np.asarray(got.converged), np.asarray(ref.converged))
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.u_seq), np.asarray(ref.u_seq), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got.big_k_seq), np.asarray(ref.big_k_seq), atol=1e-7
    )


def test_batched_solve_backend_validation():
    from quattro_tpu.parallel.batch import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    with pytest.raises(ValueError):
        batched_ilqr_solve(
            dyn, cost, fcost, jnp.zeros((2, 4)), jnp.zeros((2, 10, 1)),
            riccati_backend="warp",
        )
    # Forcing the fused backend with adaptive_reg must be as loud as the
    # single-trajectory fused entry points (the kernel bakes reg as a
    # literal, dropping the LM mu-schedule silently otherwise).
    with pytest.raises(ValueError, match="adaptive"):
        batched_ilqr_solve(
            dyn, cost, fcost, jnp.zeros((2, 4)), jnp.zeros((2, 10, 1)),
            ILQRConfig(adaptive_reg=True), riccati_backend="fused",
        )


def test_auto_dispatch_respects_pinned_algorithm(monkeypatch):
    """A user who pins riccati=/parallel_riccati asked for a specific
    backward-pass algorithm; the batched 'auto' dispatch must not substitute
    the fused sequential-law kernel for it. linesearch="fused" COMPOSES
    instead: the batched iteration swaps in the batched rollout kernel
    (ops/fused_rollout.py::fused_feedback_rollouts_batched)."""
    from quattro_tpu.parallel.batch import _fused_backend_applies
    from quattro_tpu.solver import ILQRConfig

    x0 = jnp.zeros((16, 4), jnp.float32)
    u0 = jnp.zeros((16, 10, 1), jnp.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _fused_backend_applies(ILQRConfig(), x0, u0)
    assert not _fused_backend_applies(ILQRConfig(riccati="assoc"), x0, u0)
    assert not _fused_backend_applies(ILQRConfig(riccati="seq"), x0, u0)
    assert not _fused_backend_applies(ILQRConfig(parallel_riccati=True), x0, u0)
    assert _fused_backend_applies(ILQRConfig(linesearch="fused"), x0, u0)
    assert not _fused_backend_applies(ILQRConfig(adaptive_reg=True), x0, u0)


def test_fused_multi_batch_tile():
    """More than one lane tile (B > tile_b) exercises the outer grid dim and
    the carry re-initialization per batch tile."""
    a, b, exp, v_x, v_xx = _random_problem(130, 8, 3, 2, jnp.float64, seed=7)
    reg = 1e-6
    k_ref, big_k_ref = _oracle(a, b, exp, v_x, v_xx, reg)
    k, big_k = riccati_backward_batched_fused(
        a, b, exp, v_x, v_xx, reg, interpret=True, tile_b=128, block_t=8
    )
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(big_k), np.asarray(big_k_ref), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("horizon,n,m", [(20, 3, 2), (17, 12, 4), (8, 4, 1)])
def test_fused_single_matches_scan_f64(horizon, n, m):
    """Single-trajectory fused kernel vs the sequential scan (exact in f64)."""
    from quattro_tpu.ops.fused_riccati import riccati_backward_fused_single

    a, b, exp, v_x, v_xx = _random_problem(1, horizon, n, m, jnp.float64, seed=11)
    sq = lambda x: x[0]
    a, b, v_x, v_xx = sq(a), sq(b), sq(v_x), sq(v_xx)
    exp = jax.tree.map(sq, exp)
    reg = 1e-6
    ref = riccati_backward(a, b, exp, v_x, v_xx, reg)
    k, big_k, v_x_seq, v_xx_seq = riccati_backward_fused_single(
        a, b, exp, v_x, v_xx, reg, interpret=True
    )
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.k_seq), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(big_k), np.asarray(ref.big_k_seq), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(v_x_seq), np.asarray(ref.v_x_seq), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(v_xx_seq), np.asarray(ref.v_xx_seq), rtol=1e-9, atol=1e-9
    )


def test_fused_riccati_mode_in_solver():
    """`ILQRConfig(riccati="fused")` runs the full solve through the fused
    kernel (interpret off-TPU) and matches the seq mode."""
    from quattro_tpu.solver import ILQRConfig, ilqr_solve, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.15, 0.0, 0.2, 0.0])
    u0 = jnp.zeros((16, 1))
    ref = ilqr_solve(dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-1, riccati="seq"))
    got = ilqr_solve(dyn, cost, fcost, x0, u0, ILQRConfig(tol=1e-1, riccati="fused"))
    assert int(got.iterations) == int(ref.iterations)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.u_seq), np.asarray(ref.u_seq), atol=1e-8)


def test_bf16_stream_variant_close_to_f32():
    """stream_dtype=bf16 quantizes the streamed stage inputs only: gains stay
    within the bf16 input-mantissa error band of the f32 kernel; carry and
    outputs remain f32."""
    batch, horizon, n, m = 4, 24, 6, 2
    a, b, exp, v_x, v_xx = _random_problem(batch, horizon, n, m, jnp.float32, seed=3)
    k32, big_k32 = riccati_backward_batched_fused(
        a, b, exp, v_x, v_xx, 1e-6, interpret=True
    )
    k16, big_k16 = riccati_backward_batched_fused(
        a, b, exp, v_x, v_xx, 1e-6, interpret=True, stream_dtype=jnp.bfloat16
    )
    assert k16.dtype == jnp.float32 and big_k16.dtype == jnp.float32
    # Different (quantized inputs) but close: bf16 has ~2^-8 relative
    # mantissa, amplified mildly by the recursion.
    scale = float(jnp.max(jnp.abs(k32)))
    err = float(jnp.max(jnp.abs(k16 - k32))) / scale
    assert err < 0.05, err
    errK = float(jnp.max(jnp.abs(big_k16 - big_k32))) / float(
        jnp.max(jnp.abs(big_k32))
    )
    assert errK < 0.05, errK
    assert err > 0.0  # actually quantized, not a silent no-op


def test_fused_bf16_backend_close_to_fused():
    """riccati_backend='fused_bf16' (opt-in quantized input streaming) solves
    within the bf16 band of the exact fused backend and is never
    auto-selected."""
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import cartpole_dynamics, make_discrete

    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
    )
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0s = jnp.asarray(
        np.stack([[0.2, 0, 0.3, 0], [-0.1, 0, -0.2, 0]]), jnp.float32
    )
    u0s = jnp.zeros((2, 12, 1), jnp.float32)
    cfg = ILQRConfig(tol=1e-12, max_iter=2)
    exact = batched_ilqr_solve(dyn, cost, fcost, x0s, u0s, cfg, riccati_backend="fused")
    quant = batched_ilqr_solve(
        dyn, cost, fcost, x0s, u0s, cfg, riccati_backend="fused_bf16"
    )
    rel = np.abs(np.asarray(quant.cost) - np.asarray(exact.cost)) / np.abs(
        np.asarray(exact.cost)
    )
    assert rel.max() < 0.05, rel
    with pytest.raises(ValueError):
        batched_ilqr_solve(
            dyn, cost, fcost, x0s, u0s, ILQRConfig(adaptive_reg=True),
            riccati_backend="fused_bf16",
        )


# ---------------------------------------------------------------------------
# batch2d kernel (batch packed on sublanes AND lanes, r5)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "batch,horizon,n,m,tile_s,block_t",
    [
        (5, 11, 3, 2, 1, 2),  # pad both axes, chunk=128
        (300, 7, 5, 3, 2, 4),  # multi batch tile, sublane packing
        (4, 13, 12, 4, 1, 2),  # flagship dims, horizon pad 13 -> 14
    ],
)
def test_fused2d_matches_vmapped_scan_f64(batch, horizon, n, m, tile_s, block_t):
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused2d

    a, b, exp, v_x, v_xx = _random_problem(batch, horizon, n, m, jnp.float64)
    reg = 1e-6
    k_ref, big_k_ref = _oracle(a, b, exp, v_x, v_xx, reg)
    k, big_k = riccati_backward_batched_fused2d(
        a, b, exp, v_x, v_xx, reg, interpret=True, tile_s=tile_s, block_t=block_t
    )
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(big_k), np.asarray(big_k_ref), rtol=1e-9, atol=1e-9
    )


def test_fused2d_bf16_stream_close_to_f32():
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused2d

    a, b, exp, v_x, v_xx = _random_problem(4, 12, 12, 4, jnp.float32, seed=5)
    reg = 1e-6
    k_ref, big_k_ref = riccati_backward_batched_fused2d(
        a, b, exp, v_x, v_xx, reg, interpret=True, tile_s=1, block_t=2
    )
    k, big_k = riccati_backward_batched_fused2d(
        a, b, exp, v_x, v_xx, reg, interpret=True, tile_s=1, block_t=2,
        stream_dtype=jnp.bfloat16,
    )
    # Input quantization only: the bf16 mantissa of the stage data bounds the
    # gain error (same ~1e-2 absolute band as the column-major stream test).
    scale = float(jnp.max(jnp.abs(big_k_ref)))
    assert float(jnp.max(jnp.abs(k - k_ref))) < 3e-2 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(big_k - big_k_ref))) < 3e-2 * max(scale, 1.0)


def test_fused_auto_width_dispatch(monkeypatch):
    """The auto wrapper picks batch2d only for wide, low-pad-waste batches."""
    import quattro_tpu.ops.fused_riccati as fr

    monkeypatch.setattr(
        fr, "riccati_backward_batched_fused2d", lambda *a, **k: ("2d", "2d")
    )
    monkeypatch.setattr(
        fr, "riccati_backward_batched_fused", lambda *a, **k: ("col", "col")
    )
    dummy = lambda b: jnp.zeros((b, 4, 3, 3))
    args = lambda b: (dummy(b), dummy(b), None, None, None)
    assert fr.riccati_backward_batched_fused_auto(*args(1024))[0] == "2d"
    assert fr.riccati_backward_batched_fused_auto(*args(4096))[0] == "2d"
    assert fr.riccati_backward_batched_fused_auto(*args(64))[0] == "col"
    # pad waste 2048/1100 = 1.86 > 1.25 -> column-major
    assert fr.riccati_backward_batched_fused_auto(*args(1100))[0] == "col"


def test_bf16_stream_never_auto_selected():
    """Pin the r5 certification decision (benchmarks/bf16_cert_tpu.json:
    9.6% convergence-flag flips at collection scale -> promote_to_default
    false): no dispatch path may silently choose a bf16 input stream —
    'auto' must resolve to the exact f32 kernels only."""
    import json
    import os

    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "bf16_cert_tpu.json",
    )
    if os.path.exists(art):
        with open(art) as f:
            decision = json.load(f)
        assert decision["promote_to_default"] is False, (
            "bf16_cert artifact now says promote - update the dispatch AND "
            "this pin together"
        )

    # Structural check: the auto backend only streams bf16 when the caller
    # explicitly passes riccati_backend='fused_bf16'.
    import inspect

    from quattro_tpu.parallel import batch as batch_mod

    src = inspect.getsource(batch_mod._batched_ilqr_solve_fused.__wrapped__
                            if hasattr(batch_mod._batched_ilqr_solve_fused, "__wrapped__")
                            else batch_mod._batched_ilqr_solve_fused)
    assert "stream_dtype=stream_dtype" in src  # threaded, not hardcoded
    src_solve = inspect.getsource(batch_mod.batched_ilqr_solve)
    assert 'riccati_backend == "fused_bf16"' in src_solve
