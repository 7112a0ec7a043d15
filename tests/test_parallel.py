"""Distributed tests on the 8-device CPU-emulated mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quattro_tpu.parallel import (
    batched_ilqr_solve,
    make_mesh,
    sharded_ilqr_solve,
    sharded_riccati_backward,
)
from quattro_tpu.solver import (
    ILQRConfig,
    ilqr_solve,
    make_quadratic_cost,
    make_quadratic_final_cost,
    riccati_backward,
)
from quattro_tpu.solver.derivatives import CostExpansion
from quattro_tpu.systems import cartpole_dynamics, make_discrete


def _cartpole():
    dyn = make_discrete(cartpole_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(jnp.array([5.0, 0.1, 10.0, 0.1]), jnp.array([0.001]), jnp.zeros(4))
    fcost = make_quadratic_final_cost(jnp.array([50.0, 6.0, 100.0, 0.1]), jnp.zeros(4))
    return dyn, cost, fcost


def random_lq(key, n, m, horizon):
    ks = jax.random.split(key, 8)
    a = jnp.eye(n) + 0.01 * jax.random.normal(ks[0], (horizon, n, n))
    b = 0.05 * jax.random.normal(ks[1], (horizon, n, m))
    l_x = jax.random.normal(ks[2], (horizon, n))
    l_u = jax.random.normal(ks[3], (horizon, m))
    w = jax.random.normal(ks[4], (horizon, n, n))
    l_xx = 0.1 * jnp.einsum("hij,hkj->hik", w, w) + 0.1 * jnp.eye(n)
    wu = jax.random.normal(ks[5], (horizon, m, m))
    l_uu = 0.1 * jnp.einsum("hij,hkj->hik", wu, wu) + jnp.eye(m)
    l_ux = 0.1 * jax.random.normal(ks[6], (horizon, m, n))
    v_x = jax.random.normal(ks[7], (n,))
    wf = jax.random.normal(key, (n, n))
    v_xx = wf @ wf.T + jnp.eye(n)
    return a, b, CostExpansion(l_x, l_u, l_xx, l_uu, l_ux), v_x, v_xx


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh((8, 1))
    assert mesh.shape == {"traj": 8, "horizon": 1}
    mesh2 = make_mesh((2, 4))
    assert mesh2.shape == {"traj": 2, "horizon": 4}
    with pytest.raises(ValueError):
        make_mesh((3, 2))


def test_batched_solve_matches_single():
    dyn, cost, fcost = _cartpole()
    x0s = jnp.array([[0.2, 0.0, 0.3, 0.0], [-0.1, 0.0, -0.2, 0.0]])
    u0s = jnp.zeros((2, 30, 1))
    batch = batched_ilqr_solve(dyn, cost, fcost, x0s, u0s, ILQRConfig(tol=1e-1))
    for i in range(2):
        single = ilqr_solve(dyn, cost, fcost, x0s[i], u0s[i], ILQRConfig(tol=1e-1))
        np.testing.assert_allclose(float(batch.cost[i]), float(single.cost), rtol=1e-10)


def test_sharded_traj_solve_matches_batched():
    """Data-parallel trajectory sharding over 8 devices == unsharded vmap."""
    dyn, cost, fcost = _cartpole()
    mesh = make_mesh((8, 1))
    key = jax.random.PRNGKey(0)
    x0s = 0.3 * jax.random.normal(key, (16, 4))
    u0s = jnp.zeros((16, 30, 1))
    cfg = ILQRConfig(tol=1e-1, max_iter=20)
    plain = batched_ilqr_solve(dyn, cost, fcost, x0s, u0s, cfg)
    sharded = sharded_ilqr_solve(dyn, cost, fcost, x0s, u0s, mesh, cfg)
    np.testing.assert_allclose(np.asarray(sharded.cost), np.asarray(plain.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sharded.u_seq), np.asarray(plain.u_seq), atol=1e-8)


@pytest.mark.parametrize("shards,horizon", [(2, 64), (4, 64), (8, 256)])
def test_horizon_partitioned_riccati_matches_sequential(shards, horizon):
    """Halo-exchange horizon partitioning == sequential backward pass."""
    mesh = make_mesh((8 // shards, shards))
    n, m = 12, 4
    a, b, exp, v_x, v_xx = random_lq(jax.random.PRNGKey(7), n, m, horizon)
    seq = riccati_backward(a, b, exp, v_x, v_xx)
    par = sharded_riccati_backward(mesh, a, b, exp, v_x, v_xx)
    np.testing.assert_allclose(np.asarray(par.v_x_seq), np.asarray(seq.v_x_seq), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.k_seq), np.asarray(seq.k_seq), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(par.big_k_seq), np.asarray(seq.big_k_seq), rtol=1e-3, atol=1e-5
    )


def test_horizon_partitioned_riccati_cartpole():
    """Same check on a real (non-random) problem: the cart-pole LQ subproblem."""
    from quattro_tpu.solver import linearize_dynamics, quadratize_cost, quadratize_final_cost

    dyn, cost, fcost = _cartpole()
    x0 = jnp.array([0.2, 0.0, 0.3, 0.0])
    sol = ilqr_solve(dyn, cost, fcost, x0, jnp.zeros((32, 1)), ILQRConfig(tol=1e-1))
    a, b = linearize_dynamics(dyn, sol.x_seq, sol.u_seq)
    exp = quadratize_cost(cost, sol.x_seq, sol.u_seq)
    fexp = quadratize_final_cost(fcost, sol.x_seq[-1])

    mesh = make_mesh((1, 8))
    seq = riccati_backward(a, b, exp, fexp.v_x, fexp.v_xx)
    par = sharded_riccati_backward(mesh, a, b, exp, fexp.v_x, fexp.v_xx)
    # Tolerances as in test_riccati.py: reg placement differs between forms.
    np.testing.assert_allclose(np.asarray(par.k_seq), np.asarray(seq.k_seq), rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(par.big_k_seq), np.asarray(seq.big_k_seq), rtol=3e-3, atol=1e-3
    )


def test_podscale_riccati_2d_mesh():
    """Combined traj x horizon sharding (BASELINE config 5, miniature):
    batch of LQ problems, horizon partitioned, matches per-problem sequential
    backward passes."""
    from quattro_tpu.parallel.podscale import podscale_riccati_backward

    mesh = make_mesh((2, 4))
    batch, horizon, n, m = 4, 32, 6, 2
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 8)
    a = jnp.eye(n) + 0.01 * jax.random.normal(ks[0], (batch, horizon, n, n))
    b = 0.05 * jax.random.normal(ks[1], (batch, horizon, n, m))
    w = jax.random.normal(ks[2], (batch, horizon, n, n))
    from quattro_tpu.solver.derivatives import CostExpansion

    exp = CostExpansion(
        l_x=jax.random.normal(ks[3], (batch, horizon, n)),
        l_u=jax.random.normal(ks[4], (batch, horizon, m)),
        l_xx=0.1 * jnp.einsum("bhij,bhkj->bhik", w, w) + 0.1 * jnp.eye(n),
        l_uu=jnp.broadcast_to(jnp.eye(m), (batch, horizon, m, m)),
        l_ux=0.05 * jax.random.normal(ks[5], (batch, horizon, m, n)),
    )
    v_x = jax.random.normal(ks[6], (batch, n))
    wf = jax.random.normal(ks[7], (batch, n, n))
    v_xx = jnp.einsum("bij,bkj->bik", wf, wf) + jnp.eye(n)

    pod = podscale_riccati_backward(mesh, a, b, exp, v_x, v_xx)

    for i in range(batch):
        exp_i = CostExpansion(*(f[i] for f in exp))
        seq = riccati_backward(a[i], b[i], exp_i, v_x[i], v_xx[i])
        np.testing.assert_allclose(
            np.asarray(pod.k_seq[i]), np.asarray(seq.k_seq), rtol=2e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pod.big_k_seq[i]), np.asarray(seq.big_k_seq), rtol=2e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pod.v_x_seq[i]), np.asarray(seq.v_x_seq), rtol=1e-3, atol=1e-5
        )


def test_tree_and_ring_halo_schedules_agree():
    """Recursive-doubling (tree) and linear-ring cross-device scans produce
    the same boundary elements, and both match the sequential backward pass."""
    mesh = make_mesh((1, 8))
    n, m, horizon = 6, 2, 48
    a, b, exp, v_x, v_xx = random_lq(jax.random.PRNGKey(11), n, m, horizon)
    seq = riccati_backward(a, b, exp, v_x, v_xx)
    tree = sharded_riccati_backward(mesh, a, b, exp, v_x, v_xx, scan_mode="tree")
    ring = sharded_riccati_backward(mesh, a, b, exp, v_x, v_xx, scan_mode="ring")
    np.testing.assert_allclose(np.asarray(tree.k_seq), np.asarray(ring.k_seq), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tree.v_x_seq), np.asarray(ring.v_x_seq), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tree.k_seq), np.asarray(seq.k_seq), rtol=1e-3, atol=1e-5)
    with pytest.raises(ValueError):
        sharded_riccati_backward(mesh, a, b, exp, v_x, v_xx, scan_mode="butterfly")


def test_halo_schedule_spec_matches_lowering():
    """The analytic halo contract (payload bytes, ppermute rounds) matches
    (a) the ValueElement actually exchanged and (b) the lowered HLO of the
    cross-device schedule. The scaling harness's ICI/DCN latency model
    consumes this spec — this pins it to the real lowering."""
    from quattro_tpu.parallel.horizon import (
        _identity_element,
        cross_device_exclusive_suffix,
        halo_schedule_spec,
    )

    n, shards = 6, 8
    ident = _identity_element(n, jnp.float32)
    spec = halo_schedule_spec(n, jnp.float32, shards, mode="tree")
    # (a) payload = the element's true scalar count (3n^2 + 2n).
    leaves = jax.tree.tree_leaves(ident) if hasattr(jax.tree, "tree_leaves") else (
        jax.tree_util.tree_leaves(ident))
    assert spec["payload_scalars_per_hop"] == sum(int(np.prod(l.shape)) for l in leaves)
    assert spec["payload_bytes_per_hop"] == spec["payload_scalars_per_hop"] * 4
    assert spec["rounds"] == 4  # ceil(log2 8) + 1

    # (b) lowered op counts. Returning the full element keeps every leaf
    # live (no DCE), so tree mode lowers exactly rounds x num_leaves
    # collective_permutes; ring mode keeps ONE instance per leaf inside the
    # scan body (executed D-1 times).
    from jax import shard_map
    from jax.sharding import PartitionSpec

    mesh = make_mesh((1, shards))

    def run(mode):
        def body(block):
            idx = jax.lax.axis_index("horizon")
            # ident must match the per-shard block shape (leading axis 1);
            # the schedule itself marks it axis-varying where needed.
            ident_b = jax.tree.map(lambda x: jax.lax.broadcast(x, (1,)), ident)
            return cross_device_exclusive_suffix(
                block, "horizon", shards, idx, ident_b, mode=mode,
            )

        elem_batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (shards,) + x.shape) + 0.01, ident
        )
        spec_in = jax.tree.map(lambda _: PartitionSpec("horizon"), elem_batched)
        fn = shard_map(body, mesh=mesh, in_specs=(spec_in,), out_specs=spec_in)
        return jax.jit(fn).lower(elem_batched).as_text()

    num_leaves = len(leaves)
    tree_txt = run("tree")
    assert tree_txt.count("collective_permute") == spec["rounds"] * num_leaves
    ring_txt = run("ring")
    assert ring_txt.count("collective_permute") == num_leaves

    ring_spec = halo_schedule_spec(n, jnp.float32, shards, mode="ring")
    assert ring_spec["rounds"] == shards - 1
    with pytest.raises(ValueError):
        halo_schedule_spec(n, jnp.float32, shards, mode="butterfly")
