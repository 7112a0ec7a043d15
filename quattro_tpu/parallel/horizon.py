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
    _combine_stage_acc,
    _stage_elements_with_factors,
    _terminal_element,
    riccati_backward,
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

    Kept for the 2-D podscale path; the 1-D horizon path now uses the
    cheaper condensing form (`_local_block_element` + a plain block Riccati
    after the halo exchange — see ``sharded_riccati_backward``).
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


def _local_block_element(
    stage_elems: ValueElement,
    b_seq: jnp.ndarray,
    p_seq: jnp.ndarray,
    tail: ValueElement,
) -> ValueElement:
    """Reduce a local block of stage elements to ONE element (the condensing
    fold): ``e_t0 ∘ e_t0+1 ∘ ... ∘ e_t1-1 ∘ tail`` without materializing the
    intermediate suffixes.

    Each fold step is the Woodbury-structured ``_combine_stage_acc`` — the
    "earlier" operand is always a STAGE element whose C is rank-m (B W B'),
    so the generic combine's two n x n no-pivot LU solves collapse to one
    m x m factorization (~2x a plain Riccati step in FLOPs and a 4-deep
    instead of 12-deep in-step chain for the flagship dims).
    """

    def step(carry, inp):
        elem, b_t, p_t = inp
        return _combine_stage_acc(elem, b_t, p_t, carry), None

    acc, _ = jax.lax.scan(step, tail, (stage_elems, b_seq, p_seq), reverse=True)
    return acc


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
    res = sharded_riccati_backward(
        mesh, a_seq, b_seq, cost_exp, v_x_final, v_xx_final, reg, axis,
        scan_mode,
    )
    # v_x_seq[t] is V at step t (t = 0..H-1); the caller also needs V_T.
    return res.v_x_seq[:-1], res.v_xx_seq[:-1]


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
    """Full horizon-partitioned backward pass, condensing form (r5).

    Three phases per device:

    1. **Condense** the local block of stage elements to ONE block element
       (`_local_block_element`: a sequential fold of the Woodbury-structured
       ``_combine_stage_acc``, ~2x a plain Riccati step each — the r4 form
       instead materialized the full local SUFFIX of elements with the
       generic n x n combine and then composed every suffix with the halo,
       a measured 4.3x single-device work inflation over the plain scan).
    2. **Halo exchange** (unchanged contract: `halo_schedule_spec` pins the
       payload and round count; tree or ring `lax.ppermute` schedule).
    3. **Local solve**: the incoming exclusive suffix is a PURE value
       function (its chain ends at the terminal element, so a=0): read the
       boundary (V_x, V_xx) off it (the last shard uses the actual terminal
       pair) and run the PLAIN sequential block Riccati — gains and interior
       values at exactly `riccati_backward` cost and semantics (the
       reference update law, reg on Q_uu).

    Single-device partitioned cost is phase1 + phase3 ~= 3x one plain scan
    of the block (measured; down from 4.3x), and phase 3's gains now carry
    the sequential form's exact reg placement.
    """
    n = v_x_final.shape[0]
    dtype = a_seq.dtype
    num_shards = mesh.shape[axis]

    def local_block(a_blk, b_blk, lx, lu, lxx, luu, lux):
        """Runs per device on its (H/D)-slice of the horizon."""
        idx = jax.lax.axis_index(axis)
        exp = CostExpansion(lx, lu, lxx, luu, lux)
        elems, b_fact, p_fact = _stage_elements_with_factors(
            a_blk, b_blk, exp, reg
        )

        # The LAST shard folds the terminal element into its block so the
        # global chain ends with V_T. Other shards fold the identity.
        term = _terminal_element(v_x_final, v_xx_final)
        ident = _identity_element(n, dtype)
        tail = jax.tree.map(
            lambda t, i: jnp.where(idx == num_shards - 1, t, i), term, ident
        )

        # 1) condensing fold -> one block element
        block_elem = _local_block_element(elems, b_fact, p_fact, tail)

        # 2) exclusive suffix scan of block elements across devices — the
        #    boundary value-element ((V_x, V_xx)) halo exchange.
        acc = cross_device_exclusive_suffix(
            block_elem, axis, num_shards, idx, ident, mode=scan_mode
        )

        # 3) boundary V at this block's right edge: every non-last shard's
        #    suffix ends at the terminal element (a=0 — a pure quadratic
        #    value function), so V_x = -eta, V_xx = J; the last shard IS the
        #    edge and uses the terminal pair directly. Then one plain block
        #    Riccati produces gains + interior values.
        last = idx == num_shards - 1
        v_edge_x = jnp.where(last, v_x_final, -acc.eta)
        v_edge_xx = jnp.where(last, v_xx_final, acc.j)
        res = riccati_backward(a_blk, b_blk, exp, v_edge_x, v_edge_xx, reg)
        return res.k_seq, res.big_k_seq, res.v_x_seq[:-1], res.v_xx_seq[:-1]

    spec = PartitionSpec(axis)
    from jax import shard_map

    k_seq, big_k_seq, v_x_head, v_xx_head = shard_map(
        local_block,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
    )(a_seq, b_seq, cost_exp.l_x, cost_exp.l_u, cost_exp.l_xx, cost_exp.l_uu, cost_exp.l_ux)

    v_x_seq = jnp.concatenate([v_x_head, v_x_final[None]], axis=0)
    v_xx_seq = jnp.concatenate([v_xx_head, v_xx_final[None]], axis=0)
    return RiccatiResult(k_seq, big_k_seq, v_x_seq, v_xx_seq)
