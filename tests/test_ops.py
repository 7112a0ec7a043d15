"""Structured linear algebra tests: SpMV, small Cholesky, LQR KKT assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.ops import (
    BlockTridiagonal,
    batched_cholesky_solve,
    batched_spd_solve,
    btd_matvec,
    btd_matvec_pallas,
    build_lqr_kkt,
    kkt_residual,
)
from quattro_tpu.ops.blocktridiag import btd_solve, recover_primal
from quattro_tpu.solver import (
    ILQRConfig,
    feedback_rollout,
    ilqr_solve,
    linearize_dynamics,
    make_quadratic_cost,
    make_quadratic_final_cost,
    quadratize_cost,
    quadratize_final_cost,
    riccati_backward,
)
from quattro_tpu.systems import cartpole_dynamics, make_discrete


def random_btd(key, num_blocks, n, spd=True):
    k1, k2 = jax.random.split(key)
    diag = jax.random.normal(k1, (num_blocks, n, n))
    lower = 0.1 * jax.random.normal(k2, (num_blocks - 1, n, n))
    if spd:
        diag = jnp.einsum("tij,tkj->tik", diag, diag) + 3.0 * jnp.eye(n)
    return BlockTridiagonal(diag=diag, lower=lower)


def dense_from_btd(mat: BlockTridiagonal) -> np.ndarray:
    num_blocks, n, _ = mat.diag.shape
    dense = np.zeros((num_blocks * n, num_blocks * n))
    for t in range(num_blocks):
        dense[t * n : (t + 1) * n, t * n : (t + 1) * n] = np.asarray(mat.diag[t])
    for t in range(num_blocks - 1):
        blk = np.asarray(mat.lower[t])
        dense[(t + 1) * n : (t + 2) * n, t * n : (t + 1) * n] = blk
        dense[t * n : (t + 1) * n, (t + 1) * n : (t + 2) * n] = blk.T
    return dense


class TestSpMV:
    def test_matvec_matches_dense(self):
        mat = random_btd(jax.random.PRNGKey(0), 16, 5, spd=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 5))
        dense = dense_from_btd(mat)
        expected = (dense @ np.asarray(x).ravel()).reshape(16, 5)
        np.testing.assert_allclose(np.asarray(btd_matvec(mat, x)), expected, rtol=1e-10)

    def test_pallas_matvec_matches_jnp(self):
        mat = random_btd(jax.random.PRNGKey(2), 32, 8, spd=False)
        x = jax.random.normal(jax.random.PRNGKey(3), (32, 8))
        ref = btd_matvec(mat, x)
        out = btd_matvec_pallas(mat, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)

    def test_block_nnz(self):
        mat = random_btd(jax.random.PRNGKey(4), 10, 3)
        assert mat.block_nnz == 10 + 2 * 9


class TestSmallCholesky:
    @pytest.mark.parametrize("m", [1, 2, 4, 8])
    def test_solve_matches_lu(self, m):
        key = jax.random.PRNGKey(m)
        w = jax.random.normal(key, (64, m, m))
        a = jnp.einsum("bij,bkj->bik", w, w) + jnp.eye(m)
        b = jax.random.normal(jax.random.PRNGKey(m + 100), (64, m, 3))
        x, l = batched_cholesky_solve(a, b)
        expected = jnp.linalg.solve(a, b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(expected), rtol=1e-8, atol=1e-10)
        # L is a valid Cholesky factor.
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("bij,bkj->bik", l, l)), np.asarray(a), rtol=1e-8
        )

    def test_dispatch_large_falls_back(self):
        key = jax.random.PRNGKey(9)
        w = jax.random.normal(key, (4, 16, 16))
        a = jnp.einsum("bij,bkj->bik", w, w) + jnp.eye(16)
        b = jax.random.normal(key, (4, 16, 1))
        np.testing.assert_allclose(
            np.asarray(batched_spd_solve(a, b)), np.asarray(jnp.linalg.solve(a, b)), rtol=1e-8
        )


class TestLQRKKT:
    @pytest.fixture(scope="class")
    def lq_subproblem(self):
        dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
        cost = make_quadratic_cost(
            jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4)
        )
        fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
        x0 = jnp.array([0.2, 0.0, 0.3, 0.0])
        sol = ilqr_solve(dyn, cost, fcost, x0, jnp.zeros((30, 1)), ILQRConfig(tol=1e-1))
        a, b = linearize_dynamics(dyn, sol.x_seq, sol.u_seq)
        exp = quadratize_cost(cost, sol.x_seq, sol.u_seq)
        fexp = quadratize_final_cost(fcost, sol.x_seq[-1])
        return dyn, cost, fcost, sol, a, b, exp, fexp

    def test_kkt_is_spd_and_solvable(self, lq_subproblem):
        *_, a, b, exp, fexp = lq_subproblem
        system = build_lqr_kkt(a, b, exp, fexp.v_x, fexp.v_xx)
        dense = dense_from_btd(system.matrix)
        eigs = np.linalg.eigvalsh(dense)
        assert eigs.min() > 0, "dual Schur KKT must be SPD"

    def test_btd_solve_matches_dense(self, lq_subproblem):
        *_, a, b, exp, fexp = lq_subproblem
        system = build_lqr_kkt(a, b, exp, fexp.v_x, fexp.v_xx)
        lam = btd_solve(system.matrix, system.rhs)
        dense = dense_from_btd(system.matrix)
        expected = np.linalg.solve(dense, np.asarray(system.rhs).ravel()).reshape(lam.shape)
        np.testing.assert_allclose(np.asarray(lam), expected, rtol=1e-8, atol=1e-10)
        res = kkt_residual(system.matrix, lam, system.rhs)
        assert float(jnp.max(res)) < 1e-8

    def test_kkt_solution_matches_riccati_newton_step(self, lq_subproblem):
        """The KKT route and the Riccati route solve the same LQ subproblem:
        dx from the KKT multipliers == (alpha=1 feedback rollout) - nominal,
        for the LINEARIZED dynamics."""
        dyn, cost, fcost, sol, a, b, exp, fexp = lq_subproblem
        system = build_lqr_kkt(a, b, exp, fexp.v_x, fexp.v_xx, reg=1e-9)
        lam = btd_solve(system.matrix, system.rhs)
        dx_kkt = recover_primal(system, lam)  # (H, n): dx_1..dx_H

        res = riccati_backward(a, b, exp, fexp.v_x, fexp.v_xx, reg=1e-9)

        # Roll the gains through the LINEARIZED dynamics (the QP's model):
        # dx_{t+1} = A dx_t + B (k_t + K_t dx_t).
        def step(dx, inp):
            a_t, b_t, k_t, big_k_t = inp
            du = k_t + big_k_t @ dx
            dx_next = a_t @ dx + b_t @ du
            return dx_next, dx_next

        _, dx_riccati = jax.lax.scan(
            step, jnp.zeros(4), (a, b, res.k_seq, res.big_k_seq)
        )
        np.testing.assert_allclose(
            np.asarray(dx_kkt), np.asarray(dx_riccati), rtol=1e-5, atol=1e-8
        )


def test_pallas_cholesky_matches_unrolled():
    from quattro_tpu.ops.smallchol import batched_cholesky_solve_pallas

    key = jax.random.PRNGKey(3)
    for m, r, batch in ((4, 5, 256), (1, 2, 128)):
        w = jax.random.normal(key, (batch, m, m))
        a = jnp.einsum("bij,bkj->bik", w, w) + jnp.eye(m)
        b = jax.random.normal(key, (batch, m, r))
        expected, _ = batched_cholesky_solve(a, b)
        out = batched_cholesky_solve_pallas(a, b, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6, atol=1e-8)


class TestSmallLU:
    """ops/smalllu.py: unrolled no-pivot LU vs jnp.linalg.solve."""

    def _problems(self, n, batch, key):
        import jax
        import jax.numpy as jnp

        k1, k2, k3 = jax.random.split(key, 3)
        # The Riccati-combine shape: I + C @ J with C, J PSD.
        wc = jax.random.normal(k1, (batch, n, n))
        wj = jax.random.normal(k2, (batch, n, n))
        c = jnp.einsum("bij,bkj->bik", wc, wc)
        j = 0.5 * jnp.einsum("bij,bkj->bik", wj, wj)
        a = jnp.eye(n) + c @ j
        b = jax.random.normal(k3, (batch, n, 2 * n + 1))
        return a, b

    @pytest.mark.parametrize("n", [4, 8, 12])
    def test_matches_lu_solve(self, n):
        import jax
        import jax.numpy as jnp

        from quattro_tpu.ops.smalllu import batched_small_solve

        a, b = self._problems(n, 32, jax.random.PRNGKey(0))
        want = jnp.linalg.solve(a, b)
        got = batched_small_solve(a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)

    def test_transpose_solve(self):
        import jax
        import jax.numpy as jnp

        from quattro_tpu.ops.smalllu import batched_small_solve

        a, b = self._problems(12, 16, jax.random.PRNGKey(1))
        want = jnp.linalg.solve(jnp.swapaxes(a, -1, -2), b)
        got = batched_small_solve(a, b, transpose=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)

    def test_refinement_tightens_f32(self):
        """In f32 the no-pivot solve needs refinement; one step must land
        within ~10x of the pivoted LU result's own error."""
        import jax
        import jax.numpy as jnp

        a, b = self._problems(12, 64, jax.random.PRNGKey(2))
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        from quattro_tpu.ops.smalllu import batched_small_solve

        exact = np.asarray(jnp.linalg.solve(a, b))  # f64 ground truth
        lu32 = np.asarray(jnp.linalg.solve(a32, b32)).astype(np.float64)
        ours32 = np.asarray(batched_small_solve(a32, b32, refine_steps=1)).astype(np.float64)
        scale = np.max(np.abs(exact))
        err_lu = np.max(np.abs(lu32 - exact)) / scale
        err_ours = np.max(np.abs(ours32 - exact)) / scale
        assert err_ours < 10 * err_lu + 1e-6, (err_ours, err_lu)


def test_pallas_cholesky_grid_padding_path():
    """Batch not divisible by the tile: padded lanes must not leak into the
    result (the kernel pads with identity systems)."""
    import jax
    import jax.numpy as jnp

    from quattro_tpu.ops.smallchol import batched_cholesky_solve, batched_cholesky_solve_pallas

    key = jax.random.PRNGKey(5)
    batch, m, r = 301, 4, 13  # not a multiple of any tile
    w = jax.random.normal(key, (batch, m, m))
    a = jnp.einsum("bij,bkj->bik", w, w) + 2 * jnp.eye(m)
    b = jax.random.normal(key, (batch, m, r))
    want, _ = batched_cholesky_solve(a, b)
    got = batched_cholesky_solve_pallas(a, b, interpret=True)
    assert got.shape == (batch, m, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)
