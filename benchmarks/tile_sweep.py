"""Canonical tile/layout sweep for the fused batched Riccati kernels.

Sweeps both kernel layouts at the pod-scale chunk shapes and emits the
canonical JSON record (``benchmarks/tile_sweep_tpu.json``) that BASELINE.md
cites — the r4 verdict flagged the earlier prose-only numbers as
unreproducible-by-pointer.

Layouts:

- ``colmajor``  (`riccati_backward_batched_fused`): batch on the lane axis,
  column-major small matrices — (n, TILE_B) FMA tiles. r4 findings: VPU
  op-count bound; wider lane tiles gain <= 9%; bf16 input streaming 1.33x.
- ``batch2d``  (`riccati_backward_batched_fused2d`, r5): batch packed on
  sublanes AND lanes — every matrix entry its own (tile_s, 128) tile, FMA
  chains at full vreg utilization, free transposed reads (no duplicated
  at/bt/luxt streams). Mosaic compiles full-vreg tile_s only (8 f32 /
  16 bf16): tile_s=4 did not finish compiling in 20 min — recorded here as
  the measured boundary, and why the auto dispatch keys on batch width.

MEASURED (v5e, 2026-08-21, B=1024/2048 x H=1024): batch2d f32 (8,2) 247M
block-nnz/s vs colmajor f32 184M at the same width (158M at its r4
chunk=512 default); batch2d bf16-stream (8,4) 357M vs colmajor bf16 198M.
The sweep below reproduces the grid.

Usage: python benchmarks/tile_sweep.py [--json benchmarks/tile_sweep_tpu.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from suite import _time_pipelined, block_nnz, random_lq_problem

from quattro_tpu.ops.fused_riccati import (
    riccati_backward_batched_fused,
    riccati_backward_batched_fused2d,
)


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
    out = {"backend": jax.default_backend()}

    # (label, batch, builder) rows; each builder returns a jitted k-only fn.
    def colmajor(tile_b, block_t, stream):
        sd = jnp.bfloat16 if stream else None
        return lambda aa, bb, ee, vx, vxx: riccati_backward_batched_fused(
            aa, bb, ee, vx, vxx, tile_b=tile_b, block_t=block_t, stream_dtype=sd
        )[0]

    def batch2d(tile_s, block_t, stream):
        sd = jnp.bfloat16 if stream else None
        return lambda aa, bb, ee, vx, vxx: riccati_backward_batched_fused2d(
            aa, bb, ee, vx, vxx, tile_s=tile_s, block_t=block_t, stream_dtype=sd
        )[0]

    grid = [
        # colmajor: r4 default + the r4 sweep winners
        ("colmajor_B512_tile128_bt8", 512, colmajor(128, 8, False)),
        ("colmajor_B512_tile256_bt4_bf16", 512, colmajor(256, 4, True)),
        ("colmajor_B1024_tile128_bt8", 1024, colmajor(128, 8, False)),
        # batch2d full-vreg grid (r5)
        ("batch2d_B1024_ts8_bt1", 1024, batch2d(8, 1, False)),
        ("batch2d_B1024_ts8_bt2", 1024, batch2d(8, 2, False)),
        ("batch2d_B1024_ts8_bt2_bf16", 1024, batch2d(8, 2, True)),
        ("batch2d_B1024_ts8_bt4_bf16", 1024, batch2d(8, 4, True)),
        # B=2048 chunks (incl. the ts=16 full-bf16-vreg idea) stalled
        # compile/alloc >14 min on this rig (measured r5 boundary) — chunk
        # 1024 is the canonical wide config; bigger batches run as chained
        # 1024-chunks (bench_pod_scale).
    ]

    horizon = 1024
    data = {}
    for label, batch, fn in grid:
        if batch not in data:
            a, b, exp, v_x, v_xx = random_lq_problem(batch, horizon, n, m)
            data[batch] = (
                a, b, exp,
                jnp.broadcast_to(v_x, (batch, n)),
                jnp.broadcast_to(v_xx, (batch, n, n)),
            )
        a, b, exp, vx, vxx = data[batch]
        jfn = jax.jit(lambda aa, bb, ee, _f=fn, _vx=vx, _vxx=vxx: _f(aa, bb, ee, _vx, _vxx))
        try:
            # repeats=8 matches bench_pod_scale's methodology (the ~26 ms
            # host-fetch RTT amortizes as RTT/repeats into every number;
            # same divisor = comparable rows).
            sec = _time_pipelined(lambda *xs, _f=jfn: _f(*xs), (a, b, exp), repeats=8)
        except Exception as e:  # VMEM OOM / Mosaic limits surface here
            out[label] = {"error": str(e)[:200]}
            print(json.dumps({label: out[label]}), flush=True)
            continue
        out[label] = {
            "seconds": sec,
            "block_nnz_per_sec": block_nnz(batch, horizon) / sec,
        }
        print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
