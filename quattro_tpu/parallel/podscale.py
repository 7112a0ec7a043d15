"""Pod-scale combined sharding: trajectory batch x horizon partitioning.

BASELINE.json config 5: 4096 parallel trajectories, H=1024, the Riccati
factorization horizon-partitioned across hosts. The 2D mesh ("traj",
"horizon") shards the LQ batch over the first axis and the horizon within
each trajectory over the second; each device runs the local associative scan
for ITS (batch-shard x horizon-block) and exchanges boundary value elements
with its horizon neighbors only — cross-traffic rides one mesh axis, never
both.

Built by composing the per-trajectory horizon kernel (parallel/horizon.py)
with a vmap over the locally-resident batch shard inside one shard_map.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from quattro_tpu.solver.derivatives import CostExpansion
from quattro_tpu.solver.riccati import (
    RiccatiResult,
    ValueElement,
    _combine,
    _gains_and_value,
    _q_expansion,
    _stage_elements,
    _terminal_element,
)
from quattro_tpu.parallel.horizon import (
    _identity_element,
    _local_suffix_scan,
    _pvary,
    cross_device_exclusive_suffix,
)


def podscale_riccati_backward(
    mesh: Mesh,
    a_seq: jnp.ndarray,  # (B, H, n, n)
    b_seq: jnp.ndarray,  # (B, H, n, m)
    cost_exp: CostExpansion,  # fields (B, H, ...)
    v_x_final: jnp.ndarray,  # (B, n)
    v_xx_final: jnp.ndarray,  # (B, n, n)
    reg: float = 1e-6,
    batch_axis: str = "traj",
    horizon_axis: str = "horizon",
    scan_mode: str = "tree",
) -> RiccatiResult:
    """Batched, horizon-partitioned backward Riccati over a 2D mesh.

    B must divide the ``traj`` axis size, H the ``horizon`` axis size.
    Returns per-trajectory gains (B, H, m[, n]) and value sequences
    (B, H+1, ...), all sharded like the inputs.
    """
    n = v_x_final.shape[-1]
    dtype = a_seq.dtype
    num_h = mesh.shape[horizon_axis]

    def local_block(a_blk, b_blk, lx, lu, lxx, luu, lux, vxf, vxxf):
        """Per device: (B_loc, H_loc) slice; vmap the horizon kernel over B_loc."""
        h_idx = jax.lax.axis_index(horizon_axis)

        def one_traj(a1, b1, lx1, lu1, lxx1, luu1, lux1, vxf1, vxxf1):
            exp = CostExpansion(lx1, lu1, lxx1, luu1, lux1)
            elems = _stage_elements(a1, b1, exp, reg)
            term = _terminal_element(vxf1, vxxf1)
            ident = _identity_element(n, dtype)
            tail = jax.tree.map(
                lambda t, i: jnp.where(h_idx == num_h - 1, t, i), term, ident
            )
            elems = ValueElement(
                *(jnp.concatenate([e, t[None]], axis=0) for e, t in zip(elems, tail))
            )
            local = _local_suffix_scan(elems)
            block_elem = jax.tree.map(lambda x: x[0], local)
            local_main = jax.tree.map(lambda x: x[:-1], local)
            return local, block_elem, local_main

        local, block_elem, local_main = jax.vmap(one_traj)(
            a_blk, b_blk, lx, lu, lxx, luu, lux, vxf, vxxf
        )

        # Cross-device exclusive suffix of block elements along the horizon
        # axis, batched over the local trajectory shard.
        ident_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (a_blk.shape[0],) + x.shape),
            _identity_element(n, dtype),
        )
        ident_v = jax.tree.map(lambda x: _pvary(x, batch_axis), ident_b)
        acc = cross_device_exclusive_suffix(
            block_elem, horizon_axis, num_h, h_idx, ident_v, mode=scan_mode
        )

        combined = _combine(
            local_main, jax.tree.map(lambda x: x[:, None], acc)
        )  # (B_loc, H_loc, ...)
        v_x = -combined.eta
        v_xx = combined.j

        # Gains need V at t+1: shift left within the block, pulling the first
        # entry of the RIGHT neighbor (or terminal V on the last shard).
        def shift_next(arr, boundary):
            left_perm = [(i, (i - 1) % num_h) for i in range(num_h)]
            first = arr[:, :1]
            neighbor_first = jax.lax.ppermute(first, horizon_axis, left_perm)
            nxt = jnp.where(h_idx == num_h - 1, boundary[:, None], neighbor_first)
            return jnp.concatenate([arr[:, 1:], nxt], axis=1)

        v_x_next = shift_next(v_x, vxf)
        v_xx_next = shift_next(v_xx, vxxf)

        def gains_one(a1, b1, lx1, lu1, lxx1, luu1, lux1, vx1, vxx1):
            q = _q_expansion(a1, b1, lx1, lu1, lxx1, luu1, lux1, vx1, vxx1)
            k, big_k, _, _ = _gains_and_value(*q, reg)
            return k, big_k

        k_seq, big_k_seq = jax.vmap(jax.vmap(gains_one))(
            a_blk, b_blk, lx, lu, lxx, luu, lux, v_x_next, v_xx_next
        )
        return k_seq, big_k_seq, v_x, v_xx

    from jax import shard_map

    bh = PartitionSpec(batch_axis, horizon_axis)
    b_only = PartitionSpec(batch_axis)
    k_seq, big_k_seq, v_x, v_xx = shard_map(
        local_block,
        mesh=mesh,
        in_specs=(bh, bh, bh, bh, bh, bh, bh, b_only, b_only),
        out_specs=(bh, bh, bh, bh),
    )(
        a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu,
        cost_exp.l_ux, v_x_final, v_xx_final,
    )
    v_x_seq = jnp.concatenate([v_x, v_x_final[:, None]], axis=1)
    v_xx_seq = jnp.concatenate([v_xx, v_xx_final[:, None]], axis=1)
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)
