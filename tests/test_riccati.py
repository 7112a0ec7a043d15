"""Riccati backward passes: reference parity and parallel-vs-sequential equality."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.solver import (
    ILQRConfig,
    ilqr_solve,
    linearize_dynamics,
    make_quadratic_cost,
    make_quadratic_final_cost,
    quadratize_cost,
    quadratize_final_cost,
    riccati_backward,
    riccati_backward_associative,
    riccati_backward_segment,
)
from quattro_tpu.solver.derivatives import CostExpansion
from quattro_tpu.systems import cartpole_dynamics, make_discrete

sys.path.insert(0, "/root/reference")


def random_lq_problem(key, n, m, horizon, scale=0.1):
    ks = jax.random.split(key, 8)
    a_seq = jnp.eye(n) + scale * jax.random.normal(ks[0], (horizon, n, n)) * 0.1
    b_seq = scale * jax.random.normal(ks[1], (horizon, n, m))
    l_x = jax.random.normal(ks[2], (horizon, n))
    l_u = jax.random.normal(ks[3], (horizon, m))
    w = jax.random.normal(ks[4], (horizon, n, n))
    l_xx = scale * jnp.einsum("hij,hkj->hik", w, w) + jnp.eye(n) * 0.1
    wu = jax.random.normal(ks[5], (horizon, m, m))
    l_uu = scale * jnp.einsum("hij,hkj->hik", wu, wu) + jnp.eye(m)
    l_ux = scale * jax.random.normal(ks[6], (horizon, m, n))
    v_x = jax.random.normal(ks[7], (n,))
    wf = jax.random.normal(key, (n, n))
    v_xx = wf @ wf.T + jnp.eye(n)
    return a_seq, b_seq, CostExpansion(l_x, l_u, l_xx, l_uu, l_ux), v_x, v_xx


@pytest.fixture(scope="module")
def cartpole_trajectory():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    x0 = jnp.array([0.2, 0.0, 0.3, 0.0])
    sol = ilqr_solve(dyn, cost, fcost, x0, jnp.zeros((30, 1)), ILQRConfig(tol=1e-1))
    a_seq, b_seq = linearize_dynamics(dyn, sol.x_seq, sol.u_seq)
    exp = quadratize_cost(cost, sol.x_seq, sol.u_seq)
    fexp = quadratize_final_cost(fcost, sol.x_seq[-1])
    return sol, a_seq, b_seq, exp, fexp


def test_sequential_matches_reference_backward_pass(cartpole_trajectory):
    """Gains from our scan vs the reference's FD backward pass on the SAME
    trajectory (quattro_ilqr_tf.py:281-319) within FD truncation tolerance."""
    from quattro_ilqr_tf.quattro_ilqr_tf import iLQR_TF

    sol, a_seq, b_seq, exp, fexp = cartpole_trajectory
    res = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)

    q = np.diag([5.0, 0.1, 10.0, 0.1])
    r = np.diag([0.001])
    qf = np.diag([50.0, 6.0, 100.0, 0.1])
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")

    def np_dyn(x, u):
        return np.asarray(dyn(jnp.array(x), jnp.array(u)))

    def np_cost(x, u):
        return float(x @ q @ x + u @ r @ u)

    def np_fcost(x):
        return float(x @ qf @ x)

    ref = iLQR_TF(
        np_dyn, np_cost, np_fcost, np.asarray(sol.x_seq[0]),
        [np.zeros(1)] * 30, 30, enable_log=False,
    )
    k_ref, big_k_ref = ref.backward_pass(np.asarray(sol.x_seq), list(np.asarray(sol.u_seq)))
    # FD truncation error (eps=1e-5 stencils) accumulates through the
    # recursion; gains reach O(1e2), so compare relative-dominated.
    np.testing.assert_allclose(np.asarray(res.k_seq), np.asarray(k_ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(res.big_k_seq), np.asarray(big_k_ref), rtol=1e-3, atol=1e-3
    )


def test_associative_matches_sequential_cartpole(cartpole_trajectory):
    _, a_seq, b_seq, exp, fexp = cartpole_trajectory
    seq = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    par = riccati_backward_associative(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    # Tolerances reflect the documented reg-placement difference (1e-6 on
    # l_uu in the parallel form vs on Q_uu in the sequential form).
    np.testing.assert_allclose(np.asarray(par.v_x_seq), np.asarray(seq.v_x_seq), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.k_seq), np.asarray(seq.k_seq), rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(par.big_k_seq), np.asarray(seq.big_k_seq), rtol=3e-3, atol=1e-3)


@pytest.mark.parametrize("n,m,horizon", [(4, 1, 30), (12, 4, 50), (12, 4, 512), (8, 3, 1024)])
def test_associative_matches_sequential_random_lq(n, m, horizon):
    key = jax.random.PRNGKey(n * 1000 + m * 100 + horizon)
    a_seq, b_seq, exp, v_x, v_xx = random_lq_problem(key, n, m, horizon)
    seq = riccati_backward(a_seq, b_seq, exp, v_x, v_xx)
    par = riccati_backward_associative(a_seq, b_seq, exp, v_x, v_xx)
    np.testing.assert_allclose(np.asarray(par.k_seq), np.asarray(seq.k_seq), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(par.big_k_seq), np.asarray(seq.big_k_seq), rtol=1e-3, atol=1e-6
    )


def test_segment_matches_tail_of_full_pass(cartpole_trajectory):
    """Tail-window recursion == last `window` steps of the full recursion
    (quattro_ilqr_tf.py:326-366; both seed from the terminal cost)."""
    _, a_seq, b_seq, exp, fexp = cartpole_trajectory
    full = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    seg = riccati_backward_segment(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx, window=5)
    np.testing.assert_allclose(np.asarray(seg.k_seq), np.asarray(full.k_seq[-5:]), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(seg.big_k_seq), np.asarray(full.big_k_seq[-5:]), rtol=1e-12
    )


def test_value_function_is_positive_definite(cartpole_trajectory):
    _, a_seq, b_seq, exp, fexp = cartpole_trajectory
    res = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    eigs = np.linalg.eigvalsh(np.asarray(res.v_xx_seq))
    assert (eigs > 0).all()


def test_auto_dispatch_matches_both_forms():
    """riccati_backward_auto: sequential for batched workloads, associative
    for single-trajectory long horizons; results agree with the sequential
    form either way (docs/DESIGN.md §2 measured crossover)."""
    from quattro_tpu.solver import riccati_backward_auto

    key = jax.random.PRNGKey(0)
    # Batched regime (small horizon keeps it exact: auto == sequential).
    a_seq, b_seq, exp, v_x, v_xx = random_lq_problem(key, 6, 2, 40)
    seq = riccati_backward(a_seq, b_seq, exp, v_x, v_xx)
    auto = riccati_backward_auto(a_seq, b_seq, exp, v_x, v_xx, batch_size=64)
    np.testing.assert_allclose(np.asarray(auto.k_seq), np.asarray(seq.k_seq), rtol=1e-12)

    # Latency regime: horizon above the crossover -> associative form
    # (reg placement differs, so tolerance matches the associative tests).
    a_seq, b_seq, exp, v_x, v_xx = random_lq_problem(key, 6, 2, 300)
    seq = riccati_backward(a_seq, b_seq, exp, v_x, v_xx)
    auto = riccati_backward_auto(a_seq, b_seq, exp, v_x, v_xx, batch_size=1)
    assoc = riccati_backward_associative(a_seq, b_seq, exp, v_x, v_xx)
    np.testing.assert_allclose(np.asarray(auto.k_seq), np.asarray(assoc.k_seq), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(auto.k_seq), np.asarray(seq.k_seq), rtol=1e-3, atol=1e-6)
