"""Horizon-partitioned parallel Riccati over a device mesh.

The sequence axis of this workload is the trajectory horizon H (SURVEY.md
§5.7): the reference walks it strictly sequentially. Here the associative-scan
Riccati is partitioned across the mesh's ``horizon`` axis with a two-level
scheme (the BASELINE.json north star's "boundary value-function halo
exchange"):

1. each device reduces its local block of stage elements to ONE suffix element
   (local associative scan, O(log(H/D)) depth on-chip);
2. the per-device block elements are combined across devices — an exclusive
   suffix scan over D elements realized with ``lax.ppermute`` hops (the halo
   exchange: what travels between devices is exactly the boundary value
   function (V_x, V_xx) in element form, O(n^2) floats per hop);
3. each device composes its local inclusive suffixes with the incoming
   boundary element — embarrassingly parallel.

Built on ``shard_map`` so the communication pattern is explicit and testable
on a CPU-emulated mesh (tests/conftest.py forces 8 virtual devices).
"""

from __future__ import annotations

from typing import Tuple

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


def _pvary(x, axis):
    """Mark a replicated value as axis-varying inside shard_map.

    ``lax.pvary`` is deprecated in favor of ``lax.pcast(..., to='varying')``
    (jax >= 0.9); dispatch on availability so both spellings work.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))


def _local_suffix_scan(elems: ValueElement) -> ValueElement:
    """Inclusive suffix scan of a local block of elements, via ``lax.scan``.

    Sequential composition rather than ``associative_scan``, deliberately:
    (a) within a shard the element batch is small, so log-depth buys nothing
    (the measured single-chip crossover in docs/DESIGN.md §2 applies
    per-device), and (b) ``associative_scan`` UNROLLS the combine ~2 log2(H)
    times into the graph, which blew XLA compile time up >10x inside
    shard_map; a scan keeps ONE combine instance.
    """

    def step(carry, elem):
        composed = _combine(elem, carry)
        return composed, composed

    last = jax.tree.map(lambda x: x[-1], elems)
    init = jax.tree.map(lambda x: x[:-1], elems)
    _, suffixes = jax.lax.scan(step, last, init, reverse=True)
    return jax.tree.map(
        lambda s, l: jnp.concatenate([s, l[None]], axis=0), suffixes, last
    )


def cross_device_exclusive_suffix(
    block_elem: ValueElement,
    axis: str,
    num_shards: int,
    idx: jnp.ndarray,
    ident: ValueElement,
    mode: str = "tree",
) -> ValueElement:
    """Exclusive suffix composition of per-device block elements over ``axis``.

    Device d receives ``block[d+1] ∘ block[d+2] ∘ ... ∘ block[D-1]`` (identity
    on the last device) — the boundary value-function halo. Two schedules:

    - ``"tree"`` (default): recursive doubling — an inclusive-suffix scan with
      ppermute shifts 1, 2, 4, ... then one shift-by-1 to make it exclusive.
      ``ceil(log2 D) + 1`` rounds; with ~1 KB halos the exchange is
      latency-bound, so rounds are the cost that matters (D=64: 7 vs 63).
    - ``"ring"``: D-1 shift-by-1 hops, one combine per hop, lax.scan'd so the
      combine appears once in the graph. Simpler; fine for small D.

    ``ident`` must already be broadcast to ``block_elem``'s batch shape.
    ``idx`` is this device's index along ``axis``.
    """
    if mode == "ring":

        def hop_step(carry, hop):
            acc_c, incoming_c = carry
            shifted = jax.tree.map(
                lambda x: jax.lax.ppermute(
                    x, axis, [(i, (i - 1) % num_shards) for i in range(num_shards)]
                ),
                incoming_c,
            )
            # After `hop` hops device d holds block[d+hop] (mod D); mask out
            # wrapped-around elements.
            take = idx + hop <= num_shards - 1
            acc_c = jax.tree.map(
                lambda new, old: jnp.where(take, new, old),
                _combine(acc_c, shifted),
                acc_c,
            )
            return (acc_c, shifted), None

        ident_v = jax.tree.map(lambda x: _pvary(x, axis), ident)
        (acc, _), _ = jax.lax.scan(
            hop_step, (ident_v, block_elem), jnp.arange(1, num_shards)
        )
        return acc

    if mode != "tree":
        raise ValueError(f"unknown cross-device scan mode {mode!r}")

    # Inclusive suffix by recursive doubling: after step k, S_d covers blocks
    # [d, min(d + 2^{k+1}, D) ). Each step is ONE ppermute + ONE combine;
    # the unrolled k-loop puts only ceil(log2 D) combine instances in the
    # graph (vs D-1 for an unrolled ring).
    suffix = block_elem
    shift = 1
    while shift < num_shards:
        perm = [(i, (i - shift) % num_shards) for i in range(num_shards)]
        shifted = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), suffix)
        take = idx + shift <= num_shards - 1
        suffix = jax.tree.map(
            lambda new, old: jnp.where(take, new, old),
            _combine(suffix, shifted),
            suffix,
        )
        shift *= 2

    # Exclusive: device d wants S_{d+1}; the last device gets the identity.
    perm1 = [(i, (i - 1) % num_shards) for i in range(num_shards)]
    shifted = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm1), suffix)
    ident_v = jax.tree.map(lambda x: _pvary(x, axis), ident)
    return jax.tree.map(
        lambda s, i: jnp.where(idx == num_shards - 1, i, s), shifted, ident_v
    )


def halo_schedule_spec(n: int, dtype, num_shards: int, mode: str = "tree") -> dict:
    """Analytic contract of the halo exchange: what travels, how often.

    The payload of every ppermute hop is one :class:`ValueElement` — the
    boundary value function in affine-composition form: ``a (n,n), b (n),
    c (n,n), eta (n), j (n,n)`` = ``3n^2 + 2n`` scalars. Rounds:

    - ``tree``: recursive doubling = ``ceil(log2 D)`` inclusive-suffix hops
      + 1 exclusive shift;
    - ``ring``: ``D - 1`` shift-by-one hops.

    Tests assert the compiled HLO honors this spec (collective-permute count
    and operand bytes), and the scaling harness's analytic ICI/DCN latency
    model consumes it — so the spec, the lowering, and the projection can
    never drift apart silently.
    """
    import math

    import numpy as np

    itemsize = np.dtype(dtype).itemsize
    scalars = 3 * n * n + 2 * n
    if mode == "tree":
        rounds = (math.ceil(math.log2(num_shards)) + 1) if num_shards > 1 else 0
    elif mode == "ring":
        rounds = num_shards - 1
    else:
        raise ValueError(f"unknown cross-device scan mode {mode!r}")
    return {
        "payload_scalars_per_hop": scalars,
        "payload_bytes_per_hop": scalars * itemsize,
        "rounds": rounds,
        "total_bytes_per_device": scalars * itemsize * rounds,
    }


def _identity_element(n: int, dtype) -> ValueElement:
    """Neutral element of the composition: V passes through unchanged.

    (A=I, b=0, C=0, eta=0, J=0): combine(e, identity) == combine(identity, e)
    == e.
    """
    return ValueElement(
        a=jnp.eye(n, dtype=dtype),
        b=jnp.zeros((n,), dtype),
        c=jnp.zeros((n, n), dtype),
        eta=jnp.zeros((n,), dtype),
        j=jnp.zeros((n, n), dtype),
    )


def sharded_suffix_value_functions(
    mesh: Mesh,
    a_seq: jnp.ndarray,  # (H, n, n), H divisible by horizon-axis size
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    axis: str = "horizon",
    scan_mode: str = "tree",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(V_x[t], V_xx[t]) for t = 0..H-1 with the horizon sharded over ``axis``.

    Returns arrays of shape (H, n) / (H, n, n): entry t is the value function
    at step t; the terminal V_H is the given (v_x_final, v_xx_final). The
    layout keeps every shard the same size (H/D entries per device).
    """
    n = v_x_final.shape[0]
    dtype = a_seq.dtype
    num_shards = mesh.shape[axis]

    def local_block(a_blk, b_blk, lx, lu, lxx, luu, lux):
        """Runs per device on its (H/D)-slice of the horizon."""
        idx = jax.lax.axis_index(axis)
        exp = CostExpansion(lx, lu, lxx, luu, lux)
        elems = _stage_elements(a_blk, b_blk, exp, reg)

        # The LAST shard appends the terminal element to its block so the
        # global chain ends with V_T. Other shards append the identity.
        term = _terminal_element(v_x_final, v_xx_final)
        ident = _identity_element(n, dtype)
        tail = jax.tree.map(
            lambda t, i: jnp.where(idx == num_shards - 1, t, i), term, ident
        )
        elems = ValueElement(
            *(jnp.concatenate([e, t[None]], axis=0) for e, t in zip(elems, tail))
        )

        # 1) local inclusive suffix scan (on-chip, O(log) depth)
        local = _local_suffix_scan(elems)
        block_elem = jax.tree.map(lambda x: x[0], local)  # whole-block element

        # 2) exclusive suffix scan of block elements across devices — the
        #    boundary value-element ((V_x, V_xx)) halo exchange.
        acc = cross_device_exclusive_suffix(
            block_elem, axis, num_shards, idx, ident, mode=scan_mode
        )

        # 3) compose local suffixes (dropping the appended tail slot) with the
        #    cross-device suffix of everything to the right of this block.
        local_main = jax.tree.map(lambda x: x[:-1], local)
        combined = _combine(local_main, jax.tree.map(lambda x: x[None], acc))
        # combined[i] = V at the global time of local index i.
        return -combined.eta, combined.j

    spec = PartitionSpec(axis)
    from jax import shard_map

    v_x_all, v_xx_all = shard_map(
        local_block,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
    )(a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux)

    # v_x_all[t] is V at step t (t = 0..H-1); the caller also needs V_T.
    return v_x_all, v_xx_all


def sharded_riccati_backward(
    mesh: Mesh,
    a_seq: jnp.ndarray,
    b_seq: jnp.ndarray,
    cost_exp: CostExpansion,
    v_x_final: jnp.ndarray,
    v_xx_final: jnp.ndarray,
    reg: float = 1e-6,
    axis: str = "horizon",
    scan_mode: str = "tree",
) -> RiccatiResult:
    """Full horizon-partitioned backward pass: sharded suffix Vs + local gains."""
    v_x_head, v_xx_head = sharded_suffix_value_functions(
        mesh, a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg, axis, scan_mode
    )
    v_x_seq = jnp.concatenate([v_x_head, v_x_final[None]], axis=0)
    v_xx_seq = jnp.concatenate([v_xx_head, v_xx_final[None]], axis=0)

    def gains(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx):
        q = _q_expansion(a, b, l_x, l_u, l_xx, l_uu, l_ux, v_x, v_xx)
        k, big_k, _, _ = _gains_and_value(*q, reg)
        return k, big_k

    k_seq, big_k_seq = jax.vmap(gains)(
        a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu,
        cost_exp.l_ux, v_x_seq[1:], v_xx_seq[1:],
    )
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)
