"""Op-count-matched null kernel: the hardware floor for the batch2d layout.

The r3 verdict's >=3x stretch goal (450M block-nnz/s) asked either for the
rate or for "a hard bound proof: a minimal kernel with the same op count
but no algorithm, measured at the same rate". This harness is that proof
instrument for the r5 batch2d Riccati kernel:

- SAME streams: it reads the identical packed per-step input blocks
  (416 (8,128)-tiles/step at the canonical shape) through the same Pallas
  grid/pipeline, and writes the identical 52-tile output blocks;
- SAME op count: per step it executes ``n_fma`` dependent-chain FMAs on
  (8, 128) tiles (grouped into ``chains`` independent chains — the
  instruction-level parallelism knob), defaulting to the batch2d kernel's
  ~6.1k mul-adds with ~12-deep chains x ~510 independent chains;
- NO algorithm: no Cholesky, no stacks/concats/reshapes, no carry.

If the null kernel's steps/s matches the real kernel's, the real kernel is
AT the op-structure floor and further gains need fewer ops, not better
scheduling; a gap bounds what scheduling/layout work could still recover.

Usage: python benchmarks/vpu_floor.py [--json benchmarks/vpu_floor_tpu.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from suite import _time_pipelined, block_nnz, random_lq_problem

_LANE = 128


def null_kernel_call(total_in_tiles, total_out_tiles, n_steps, block_t,
                     n_fma, chains, tile_s=8, dtype=jnp.float32):
    """Stream-matched null kernel: returns a jitted fn of one (T, E, S, L)
    input producing (T, E_out, S, L)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = n_steps // block_t
    per_chain = max(1, n_fma // chains)

    def kernel(in_ref, out_ref):
        def step(i, _):
            tt = block_t - 1 - i
            x = in_ref[tt]  # (E, S, L): E = chains independent lanes
            acc = x
            for _d in range(per_chain):
                acc = acc * x + acc  # chains-wide FMA, per_chain deep
            out_ref[tt] = acc[: out_ref.shape[1]]
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    # ILP structure matches the real kernel: `chains` (= the whole input
    # block, 416 tiles) independent FMA chains of depth `per_chain` (~15),
    # vs the real body's ~500 independent contractions of depth ~12.
    def spec(e):
        return pl.BlockSpec(
            (block_t, e, tile_s, _LANE),
            lambda ih: (n_blocks - 1 - ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[spec(total_in_tiles)],
            out_specs=spec(total_out_tiles),
            out_shape=jax.ShapeDtypeStruct(
                (n_steps, total_out_tiles, tile_s, _LANE), dtype
            ),
        )(x)

    return jax.jit(call)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    args = parser.parse_args()
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass

    n, m = 12, 4
    B, H = 1024, 1024
    tile_s, block_t = 8, 2
    in_tiles = n * n + n * m + n * n + m * m + m * n + n + m  # 416
    out_tiles = m + m * n  # 52
    key = jax.random.PRNGKey(0)
    x = 1e-3 * jax.random.normal(key, (H, in_tiles, tile_s, _LANE), jnp.float32)

    out = {"backend": jax.default_backend(),
           "shape": {"B": B, "H": H, "in_tiles": in_tiles, "out_tiles": out_tiles}}

    # The real kernel executes ~6.1k mul-adds/step; with 416 independent
    # chains that is depth ~15. Sweep depth to separate latency-bound from
    # throughput-bound.
    for label, depth in (("matched_6240fma_d15", 15),
                         ("half_3328fma_d8", 8),
                         ("double_12480fma_d30", 30)):
        fn = null_kernel_call(in_tiles, out_tiles, H, block_t,
                              depth * in_tiles, in_tiles, tile_s)
        sec = _time_pipelined(lambda xx, _f=fn: _f(xx), (x,), repeats=8)
        eq_rate = block_nnz(B, H) / sec
        out[label] = {
            "seconds": sec,
            "fma_tile_ops_per_step": depth * in_tiles,
            "equiv_block_nnz_per_sec": eq_rate,
        }
        print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
