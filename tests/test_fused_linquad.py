"""Fused linearize+quadratize kernel vs the XLA autodiff phases.

The kernel must reproduce solver/derivatives.py's stage tensors exactly
(same autodiff operators traced in-kernel) and chain bit-consistently into
the packed-input path of the batch2d backward kernel. Interpret mode (CPU);
Mosaic lowering is exercised by benchmarks/check_tpu_lowering.py on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.ops.fused_linquad import linquad_batched_fused, unpack_stage
from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
from quattro_tpu.solver.derivatives import (
    linearize_dynamics,
    quadratize_cost,
    quadratize_final_cost,
)
from quattro_tpu.systems import make_discrete, quadrotor_dynamics

N, M = 12, 4


def _setup(batch, horizon, seed=3):
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    x_ref = jnp.zeros(N).at[2].set(0.5)
    cost = make_quadratic_cost(
        jnp.ones(N), jnp.full((M,), 0.01), x_ref, barrier_alpha=1000.0
    )
    fcost = make_quadratic_final_cost(jnp.ones(N) * 10, x_ref)
    xs = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), (batch, horizon + 1, N))
    us = 2.4 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (batch, horizon, M)
    )
    return dyn, cost, fcost, xs, us


def test_linquad_matches_xla_phases():
    B, H, ts = 128, 7, 1  # H pads 7 -> 8 (block_t=2): pad-overwrite path
    dyn, cost, _, xs, us = _setup(B, H)
    packed = linquad_batched_fused(
        dyn, cost, xs, us, interpret=True, tile_s=ts, block_t=2
    )
    a_ref, b_ref = jax.vmap(lambda x, u: linearize_dynamics(dyn, x, u))(xs, us)
    exp = jax.vmap(lambda x, u: quadratize_cost(cost, x, u))(xs, us)
    shapes = [(N, N), (N, M), (N, N), (M, M), (M, N), (N,), (M,)]
    refs = [a_ref, b_ref, exp.l_xx, exp.l_uu, exp.l_ux, exp.l_x, exp.l_u]
    for pk, shp, ref in zip(packed, shapes, refs):
        got = unpack_stage(pk, B, H, shp, ts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-11, atol=1e-11
        )


def test_linquad_packed_chain_matches_scan_backward():
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused2d
    from quattro_tpu.solver.riccati import riccati_backward

    B, H, ts = 128, 6, 1
    dyn, cost, fcost, xs, us = _setup(B, H, seed=9)
    packed = linquad_batched_fused(
        dyn, cost, xs, us, interpret=True, tile_s=ts, block_t=2
    )
    fexp = jax.vmap(lambda x: quadratize_final_cost(fcost, x))(xs[:, -1])
    k2, K2 = riccati_backward_batched_fused2d(
        None, None, None, fexp.v_x, fexp.v_xx, interpret=True,
        tile_s=ts, block_t=2, packed_stage=packed, horizon=H,
    )
    a_ref, b_ref = jax.vmap(lambda x, u: linearize_dynamics(dyn, x, u))(xs, us)
    exp = jax.vmap(lambda x, u: quadratize_cost(cost, x, u))(xs, us)
    res = jax.vmap(
        lambda a, b, e, vx, vxx: riccati_backward(a, b, e, vx, vxx)
    )(a_ref, b_ref, exp, fexp.v_x, fexp.v_xx)
    np.testing.assert_allclose(
        np.asarray(k2), np.asarray(res.k_seq), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(K2), np.asarray(res.big_k_seq), rtol=1e-9, atol=1e-9
    )


def test_linquad_misaligned_batch_raises():
    dyn, cost, _, xs, us = _setup(64, 4)
    with pytest.raises(ValueError):
        linquad_batched_fused(dyn, cost, xs, us, interpret=True, tile_s=1)
