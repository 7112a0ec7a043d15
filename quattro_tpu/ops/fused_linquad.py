"""Fused batched linearize + quadratize — one Pallas kernel, packed output.

At the batched shapes the XLA linearize/quadratize phases are LAUNCH-bound,
not compute-bound: the jacfwd-of-RK4 + forward-over-reverse Hessian traces
emit hundreds of small fusions over (B*H, ...) tensors, measured 3.3-4.0 ms
each per phase (benchmarks/batched_phases_tpu.json) against a sub-0.1 ms
FLOP budget. Unlike the rollout/backward recursions these phases have NO
sequential dependency — every (x_t, u_t) point is independent — so one
Pallas kernel evaluates the whole (A, B, l_x, l_u, l_xx, l_uu, l_ux) stage
set in a single launch:

- (batch, time) points are packed batch2d-style: each state/control
  COMPONENT is a (tile_s, 128) tile of tile_s*128 points, and the user's
  dynamics/cost derivatives are traced in with the components-first double
  vmap (every scalar intermediate a full-vreg tile);
- the derivative graph is ordinary in-kernel JAX tracing: jacfwd of the
  discrete map and grad/forward-over-reverse Hessians of the running cost —
  EXACTLY solver/derivatives.py's operators, so the semantics contract
  (quattro_ilqr_tf.py:149-275 replacement) is unchanged;
- outputs are emitted DIRECTLY in the batch2d packed stage layout
  ((nb * h_pad, entries, tile_s, 128) per tensor, horizon pre-padded with
  identity-dynamics zero-cost steps) — the exact input format of
  ``riccati_backward_batched_fused2d(packed_stage=...)``, so the
  linearize -> quadratize -> backward chain crosses HBM once in kernel
  layout with ZERO repacking transposes between phases.

The same Mosaic-vs-XLA transcendental boundary measured for the rollout
kernel applies per element — but here XLA's form is launch-bound, not
element-bound, which is why this fusion wins where the rollout one loses
(see BASELINE.md r5 notes for both measurements).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hoist_array_constants_multi(fn, *example_args):
    """`fused_solve._hoist_array_constants` for tuple-output functions."""
    closed = jax.make_jaxpr(fn)(*example_args)
    n_args = len(example_args)

    def conv(*args_and_consts):
        args = args_and_consts[:n_args]
        consts = args_and_consts[n_args:]
        return tuple(jax.core.eval_jaxpr(closed.jaxpr, consts, *args))

    return conv, list(closed.consts)


def linquad_batched_fused(
    dynamics: Callable,
    cost: Callable,
    x_seq: jnp.ndarray,  # (B, H+1, n) (last state unused)
    u_seq: jnp.ndarray,  # (B, H, m)
    interpret: bool = False,
    tile_s: int | None = None,
    block_t: int = 2,
) -> Tuple[jnp.ndarray, ...]:
    """All stage derivatives for a trajectory batch in ONE kernel launch.

    Returns the seven PACKED stage tensors
    ``(a, b, l_xx, l_uu, l_ux, l_x, l_u)``, each shaped
    ``(nb * h_pad, entries, tile_s, 128)`` in the batch2d layout with the
    horizon pre-padded (identity dynamics, zero cost, l_uu = I) — feed them
    to ``riccati_backward_batched_fused2d(packed_stage=...)`` or unpack
    with :func:`unpack_stage`. Requires ``batch`` divisible by
    ``tile_s * 128`` (the packed-path alignment contract).
    """
    batch, horizon, m = u_seq.shape
    n = x_seq.shape[-1]
    dtype = x_seq.dtype
    if tile_s is None:
        tile_s = max(1, min(8, -(-batch // _LANE)))
    chunk = tile_s * _LANE
    if batch % chunk:
        raise ValueError(
            f"linquad_batched_fused needs batch % (tile_s*128) == 0 "
            f"(got batch={batch}, tile_s={tile_s})"
        )
    nb = batch // chunk
    h_pad = _round_up(horizon, block_t)
    ph = h_pad - horizon
    n_hblocks = h_pad // block_t

    # Pack points: (B, H, d) -> (nb * h_pad, d, S, L), REAL steps at the END
    # of each padded block run (pad steps prepended in time, matching the
    # backward kernel's convention). Pad points evaluate the plant at the
    # trajectory's first state (guaranteed-finite input); their derivative
    # outputs are OVERWRITTEN with the identity/zero stage below.
    def pack(x):  # (B, h_pad, d)
        d = x.shape[-1]
        xr = x.reshape(nb, tile_s, _LANE, h_pad, d)
        return jnp.transpose(xr, (0, 3, 4, 1, 2)).reshape(
            nb * h_pad, d, tile_s, _LANE
        )

    def pre_pad(x):  # (B, H, d) -> (B, h_pad, d): repeat first step
        if ph == 0:
            return x
        return jnp.concatenate(
            [jnp.broadcast_to(x[:, :1], (batch, ph) + x.shape[2:]), x], axis=1
        )

    x_pk = pack(pre_pad(x_seq[:, :horizon]))
    u_pk = pack(pre_pad(u_seq))

    def full(x, u):
        a, b = jax.jacfwd(dynamics, argnums=(0, 1))(x, u)
        gx = jax.grad(cost, argnums=0)
        gu = jax.grad(cost, argnums=1)
        l_x = gx(x, u)
        l_u = gu(x, u)
        l_xx = jax.jacfwd(gx, argnums=0)(x, u)
        l_uu = jax.jacfwd(gu, argnums=1)(x, u)
        l_ux = jax.jacfwd(gu, argnums=0)(x, u)
        return a, b, l_xx, l_uu, l_ux, l_x, l_u

    conv, consts = _hoist_array_constants_multi(
        full,
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((m,), dtype),
    )
    const_shapes = [jnp.shape(c) for c in consts]
    const_rows = [
        jnp.asarray(c) if np.ndim(c) >= 2 else jnp.reshape(jnp.asarray(c), (1, -1))
        for c in consts
    ]
    shapes = [(n, n), (n, m), (n, n), (m, m), (m, n), (n,), (m,)]

    def kernel(x_r, u_r, *refs):
        from jax.experimental import pallas as pl

        const_refs = refs[: len(consts)]
        outs = refs[len(consts):]
        const_vals = [
            r[...] if r.shape == shp else jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
        ]
        step_fn = jax.vmap(
            jax.vmap(
                lambda x, u: conv(x, u, *const_vals),
                in_axes=(-1, -1), out_axes=-1,
            ),
            in_axes=(1, 1), out_axes=-2,
        )

        def step(tt, _):
            vals = step_fn(x_r[tt], u_r[tt])
            for o_ref, v, shp in zip(outs, vals, shapes):
                e = int(np.prod(shp))
                o_ref[tt] = v.reshape(e, tile_s, _LANE)
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (nb, n_hblocks)

    def sspec(e):
        return pl.BlockSpec(
            (block_t, e, tile_s, _LANE),
            lambda ib, ih: (ib * n_hblocks + ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec(n), sspec(m)] + [
            pl.BlockSpec(c.shape, lambda ib, ih: (0, 0), memory_space=pltpu.VMEM)
            for c in const_rows
        ],
        out_specs=[sspec(int(np.prod(s))) for s in shapes],
        out_shape=[
            jax.ShapeDtypeStruct((nb * h_pad, int(np.prod(s)), tile_s, _LANE), dtype)
            for s in shapes
        ],
        interpret=interpret,
    )(x_pk, u_pk, *const_rows)

    if ph:
        # Overwrite the prepended pad steps with the identity/zero stage the
        # backward kernel's padding contract expects (A=I, B=0, costs=0,
        # l_uu=I). Pad rows sit at block offsets [k*h_pad, k*h_pad+ph).
        row = jnp.arange(nb * h_pad) % h_pad
        is_pad = (row < ph)[:, None, None, None]

        def fix(x, fill_flat):
            fill = jnp.asarray(fill_flat, dtype)[None, :, None, None]
            return jnp.where(is_pad, fill, x)

        eye_n = np.eye(n).ravel()
        eye_m = np.eye(m).ravel()
        outs = [
            fix(outs[0], eye_n),
            fix(outs[1], np.zeros(n * m)),
            fix(outs[2], np.zeros(n * n)),
            fix(outs[3], eye_m),
            fix(outs[4], np.zeros(m * n)),
            fix(outs[5], np.zeros(n)),
            fix(outs[6], np.zeros(m)),
        ]
    return tuple(outs)


def unpack_stage(x: jnp.ndarray, batch: int, horizon: int, shape_tail: tuple,
                 tile_s: int) -> jnp.ndarray:
    """Packed (nb * h_pad, e, S, L) -> (B, H, *shape_tail) (drops h-padding)."""
    e = x.shape[1]
    chunk = tile_s * _LANE
    nb = batch // chunk
    h_pad = x.shape[0] // nb
    xr = x.reshape(nb, h_pad, e, tile_s, _LANE)
    out = jnp.transpose(xr, (0, 3, 4, 1, 2)).reshape(batch, h_pad, e)
    return out[:, h_pad - horizon:].reshape((batch, horizon) + shape_tail)
