"""One-off sweep: fused batched Riccati kernel tile shapes at pod-feed scale.

The kernel's remaining roofline gap (BASELINE.md: ~2.1% of bandwidth bound)
is VPU serial-op latency on (12, TILE_B) tiles — every batched "matmul" is
an unrolled chain of (n, TILE_B) FMAs, so wider lane tiles amortize per-op
overhead linearly until VMEM runs out. Sweeps (tile_b, block_t) at the
pod-feed shape and at the pod-scale chunk; the winner becomes the dispatch
default in parallel/batch.py.

VMEM budget per grid step (double-buffered): ~656 floats/stage * block_t *
tile_b * 4 B * 2 -> (128, 8)=5.4 MB, (256, 8)=10.7 MB, (512, 4)=10.7 MB of
the ~16 MB/core.

MEASURED OUTCOME (v5e, 2026-08-19): tile_b=128/block_t=8 (the shipped
default) is the only configuration that compiles — every wider tile
(256x8, 256x16, 512x4) is rejected by the TPU compile helper (VMEM
over-budget once sublane padding of the n=12/m=4 dims is applied: the
nominal budget above under-counts rows padded 12->16 and the output/
scratch buffers). At the surviving config the kernel already reaches
141-150M block-nnz/s at B=512 (results_tpu.json "pod_scale"), so the
default stands; this script is kept as the rerun harness for future
hardware with bigger VMEM.

Usage: python benchmarks/tile_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from suite import _time_pipelined, block_nnz, random_lq_problem

from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
        )
    except Exception:
        pass

    n, m = 12, 4
    out = {}
    for batch, horizon in ((64, 1024), (512, 1024)):
        a, b, exp, v_x, v_xx = random_lq_problem(batch, horizon, n, m)
        v_x_b = jnp.broadcast_to(v_x, (batch, n))
        v_xx_b = jnp.broadcast_to(v_xx, (batch, n, n))
        # (tile_b, block_t, stream_dtype): wider lane tiles fill VPU pipeline
        # bubbles (the body is dependency-chain latency-bound, not
        # throughput-bound), smaller block_t buys the VMEM back, and bf16
        # streaming halves input VMEM+HBM so wide tiles fit.
        configs = [
            (128, 8, None), (128, 16, None), (256, 8, None), (256, 4, None),
            (256, 2, None), (512, 4, None), (512, 2, None),
            (128, 8, "bf16"), (256, 8, "bf16"), (256, 4, "bf16"),
            (512, 4, "bf16"), (512, 2, "bf16"),
        ]
        for tile_b, block_t, stream in configs:
            if tile_b > batch:
                continue
            sd = jnp.bfloat16 if stream == "bf16" else None
            fn = jax.jit(
                lambda aa, bb, ee, _t=tile_b, _k=block_t, _s=sd: riccati_backward_batched_fused(
                    aa, bb, ee, v_x_b, v_xx_b, tile_b=_t, block_t=_k, stream_dtype=_s
                )[0]
            )
            key = f"B{batch}_tile{tile_b}_bt{block_t}" + (f"_{stream}" if stream else "")
            try:
                sec = _time_pipelined(lambda *xs, _f=fn: _f(*xs), (a, b, exp), repeats=8)
            except Exception as e:  # VMEM OOM and Mosaic limits surface here
                out[key] = {"error": str(e)[:200]}
                print(json.dumps({key: out[key]}), flush=True)
                continue
            out[key] = {
                "seconds": sec,
                "block_nnz_per_sec": block_nnz(batch, horizon) / sec,
            }
            print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
