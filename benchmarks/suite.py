"""Extended benchmark suite: per-phase and scaling measurements.

``bench.py`` at the repo root prints the single headline JSON line; this
suite produces the full table for BASELINE.md comparisons:

1. riccati_blocknnz   block-nnz/s of the Riccati factorization — the
                      north-star throughput metric — sequential-scan vs
                      associative-scan at three shapes. Measured crossover
                      (v5e): the associative form wins ~3x on SINGLE-
                      trajectory latency at long H (its O(log H) depth);
                      with a trajectory batch >= ~8 the vmapped sequential
                      scan wins ~8x (the batch axis already fills the MXU and
                      each element combine costs ~12x a plain Riccati step).
                      ``riccati_backward_auto`` encodes this dispatch.
2. hybrid_speedup     per-iteration wall time of the hybrid (tail window +
                      transformer) iteration vs the full-horizon iteration —
                      the reference's headline per-iteration comparison
                      (README.md:29 claims 5.3x cart-pole / 27x quadrotor).
3. batch_throughput   trajectories/sec of the vmapped batched solver
                      (replaces the reference's 10-process pool).

Usage: python benchmarks/suite.py [--json out.json]
All timings pipeline dispatches (block only at the end of each repeat batch)
so tunnel round-trips don't pollute device throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def _time_pipelined(fn, args, repeats=20, warmup=1):
    """Mean device time per call, measured as ONE jitted ``fori_loop`` of
    ``repeats`` dependency-chained calls.

    A zero-valued scalar probe derived from each iteration's output perturbs
    the next iteration's first argument, so XLA cannot CSE/elide repeats, and
    the single dispatch makes the measurement immune to host/tunnel
    round-trips (this rig dispatches through a ~25 ms network tunnel).
    """

    def loop(first, *rest):
        # The probe scale is far below one ulp of O(1) data, so adding it does
        # not change the computed values — but it is data-dependent, so XLA
        # cannot constant-fold it (x*0.0 folds to 0 and the whole body gets
        # hoisted as loop-invariant — measured 4 us for a 290 MB workload).
        tiny = 1e-300 if first.dtype == jnp.float64 else 1e-30

        def body(_, carry):
            first_c, probe = carry
            out = fn(first_c + probe, *rest)
            # Reduce over the FULL output: a single-element probe lets XLA
            # dead-code-eliminate every other batch element of the call.
            new_probe = (jnp.sum(out) * tiny).astype(first_c.dtype)
            return first_c, new_probe

        zero = jnp.asarray(0.0, dtype=first.dtype)
        _, probe = jax.lax.fori_loop(0, repeats, body, (first, zero))
        return probe

    looped = jax.jit(loop)
    # On this rig block_until_ready can return before remote execution
    # finishes (axon tunnel); only a host FETCH truly synchronizes. The loop
    # returns one scalar, so the fetch cost is a single tunnel round-trip
    # amortized over `repeats` chained calls.
    float(looped(*args))  # compile + warm
    for _ in range(warmup):
        float(looped(*args))
    start = time.perf_counter()
    float(looped(*args))
    return (time.perf_counter() - start) / repeats


def random_lq_problem(batch, horizon, n, m, key=None, dtype=jnp.float32):
    """Random well-conditioned LQ problem data (shared with scaling.py).

    Returns (a, b, CostExpansion, v_x, v_xx); leading dims are
    (batch, horizon) when batch > 1, else (horizon,).
    """
    from quattro_tpu.solver.derivatives import CostExpansion

    key = jax.random.PRNGKey(0) if key is None else key
    ks = jax.random.split(key, 8)
    shape = (batch, horizon) if batch > 1 else (horizon,)
    a = jnp.eye(n, dtype=dtype) + 0.01 * jax.random.normal(ks[0], (*shape, n, n), dtype)
    b = 0.05 * jax.random.normal(ks[1], (*shape, n, m), dtype)
    w = jax.random.normal(ks[2], (*shape, n, n), dtype)
    if batch > 64 and batch % 64 == 0 and batch * horizon >= 1 << 19:
        # The one-shot einsum's (B, H, n, n) dot temp gets tile-padded on
        # TPU (~14x for n=12: both trailing dims pad toward (8, 128)) and
        # OOMs HBM at the widest shapes (first hit: B=1024 x H=1024); map
        # over 64-row batch chunks so the live temp stays ~0.5 GB. Chunks
        # must be COARSE: a per-row lax.map measured ~0.36 s/step of
        # dispatch overhead on this rig (512 steps = 3 min for the gen).
        gram = jax.lax.map(
            lambda wb: jnp.einsum("...ij,...kj->...ik", wb, wb),
            w.reshape(batch // 64, 64, *w.shape[1:]),
        ).reshape(batch, *w.shape[1:])
    else:
        gram = jnp.einsum("...ij,...kj->...ik", w, w)
    exp = CostExpansion(
        l_x=jax.random.normal(ks[3], (*shape, n), dtype),
        l_u=jax.random.normal(ks[4], (*shape, m), dtype),
        l_xx=0.1 * gram + 0.1 * jnp.eye(n, dtype=dtype),
        l_uu=jnp.broadcast_to(jnp.eye(m, dtype=dtype), (*shape, m, m)),
        l_ux=0.01 * jax.random.normal(ks[5], (*shape, m, n), dtype),
    )
    v_x = jax.random.normal(ks[6], (n,), dtype)
    wf = jax.random.normal(ks[7], (n, n), dtype)
    v_xx = wf @ wf.T + jnp.eye(n, dtype=dtype)
    return a, b, exp, v_x, v_xx


def block_nnz(batch, horizon):
    """Block-tridiagonal nonzero blocks of the trajectory KKT factorization:
    H diagonal + 2(H-1) off-diagonal blocks per trajectory."""
    return batch * (horizon + 2 * (horizon - 1))


def bench_riccati_blocknnz():
    from quattro_tpu.solver.riccati import riccati_backward, riccati_backward_associative

    results = {}
    key = jax.random.PRNGKey(0)
    for label, (batch, horizon, n, m) in {
        "mpc_scale_H100": (1, 100, 12, 4),
        "latency_scale_H1024": (1, 1024, 12, 4),
        "pod_feed_H1024": (64, 1024, 12, 4),
    }.items():
        a, b, exp, v_x, v_xx = random_lq_problem(batch, horizon, n, m, key)

        for name, backward in (
            ("sequential", riccati_backward),
            ("associative", riccati_backward_associative),
        ):
            if batch > 1:
                fn = jax.jit(
                    jax.vmap(lambda aa, bb, ee: backward(aa, bb, ee, v_x, v_xx), in_axes=(0, 0, 0))
                )
                args = (a, b, exp)
            else:
                fn = jax.jit(lambda aa, bb, ee: backward(aa, bb, ee, v_x, v_xx))
                args = (a, b, exp)
            elapsed = _time_pipelined(lambda *xs: fn(*xs).k_seq, args)
            nnz = block_nnz(batch, horizon)
            results[f"{label}/{name}"] = {
                "seconds": elapsed,
                "block_nnz_per_sec": nnz / elapsed,
            }
    return results


def bench_hybrid_speedup():
    """Per-iteration time: full-horizon backward vs tail-window + transformer.

    Uses the PORTED reference checkpoints (real trained weights) — with
    random weights the predicted head gains are garbage, the line search
    rejects every step, and the measured loop is not the production path.
    """
    from quattro_tpu.models import GainPredictor
    from quattro_tpu.models.torch_port import (
        CARTPOLE_CHECKPOINT,
        QUADROTOR_CHECKPOINT,
        load_torch_checkpoint,
    )
    from quattro_tpu.solver import (
        ILQRConfig,
        hybrid_ilqr_solve,
        ilqr_solve,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import cartpole_dynamics, make_discrete, quadrotor_dynamics

    results = {}
    quad_q = jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1])
    quad_qf = jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10])
    systems = {
        "cartpole_H30": dict(
            dyn=make_discrete(cartpole_dynamics, 0.01, "rk4"),
            n=4, m=1, horizon=30, prompt=5,
            q=jnp.array([5.0, 0.1, 10.0, 0.1]), r=jnp.array([0.001]),
            qf=jnp.array([50.0, 6.0, 100.0, 0.1]), x_ref=jnp.zeros(4),
            x0=jnp.array([0.2, 0.0, 0.3, 0.0]), barrier=0.0,
            load=lambda: load_torch_checkpoint(CARTPOLE_CHECKPOINT),
        ),
        "quadrotor_H50": dict(
            dyn=make_discrete(quadrotor_dynamics, 0.01, "rk4"),
            n=12, m=4, horizon=50, prompt=1,
            q=quad_q, r=jnp.full((4,), 0.01), qf=quad_qf,
            x_ref=jnp.zeros(12).at[2].set(0.5),
            x0=jnp.zeros(12).at[2].set(0.2).at[6].set(0.1), barrier=1000.0,
            load=lambda: load_torch_checkpoint(QUADROTOR_CHECKPOINT),
        ),
    }
    # Long-horizon regime (VERDICT r1 next #3): the transformer's value
    # proposition grows with H — the exact backward pass is a latency-bound
    # sequential/log-depth chain while the learned head is one parallel
    # forward. Uses the own-trained H=256 checkpoint when shipped.
    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "checkpoints")
    for h in (256, 512, 1024):
        path = os.path.join(ckpt_dir, f"quadrotor_h{h}_gain.npz")
        if os.path.exists(path):
            systems[f"quadrotor_H{h}"] = dict(
                dyn=make_discrete(quadrotor_dynamics, 0.01, "rk4"),
                n=12, m=4, horizon=h,
                prompt=int(GainPredictor.load(path).prompt_len),
                q=quad_q, r=jnp.full((4,), 0.01), qf=quad_qf,
                x_ref=jnp.zeros(12).at[2].set(0.5),
                x0=jnp.zeros(12).at[2].set(0.2).at[6].set(0.1), barrier=1000.0,
                load=lambda p=path: GainPredictor.load(p),
            )
    iters = 4
    for label, cfg in systems.items():
        cost = make_quadratic_cost(cfg["q"], cfg["r"], cfg["x_ref"], barrier_alpha=cfg["barrier"])
        fcost = make_quadratic_final_cost(cfg["qf"], cfg["x_ref"])
        pred = cfg["load"]()
        u0 = jnp.zeros((cfg["horizon"], cfg["m"]))
        solve_cfg = ILQRConfig(tol=0.0, max_iter=iters)

        # Two pure baselines: our best form (associative scan — what the
        # dispatch actually runs single-trajectory) and the reference-form
        # sequential backward chain (what the transformer was invented to
        # bypass, quattro_ilqr_tf.py:281-319). Reporting both keeps the
        # hybrid's value honest: it beats the sequential chain, while the
        # parallel-scan engineering beats both at these model sizes.
        pure = jax.jit(
            lambda x, u: ilqr_solve(
                cfg["dyn"], cost, fcost, x, u, solve_cfg._replace(riccati="assoc")
            )
        )
        pure_seq = jax.jit(
            lambda x, u: ilqr_solve(
                cfg["dyn"], cost, fcost, x, u, solve_cfg._replace(riccati="seq")
            )
        )
        hybrid = jax.jit(
            lambda x, u: hybrid_ilqr_solve(
                cfg["dyn"], cost, fcost, pred.predict_fn(), cfg["prompt"],
                x, u, cfg["x_ref"], solve_cfg,
            )
        )
        t_pure = _time_pipelined(lambda x, u: pure(x, u).cost, (cfg["x0"], u0)) / iters
        t_seq = _time_pipelined(lambda x, u: pure_seq(x, u).cost, (cfg["x0"], u0)) / iters
        t_hybrid = _time_pipelined(lambda x, u: hybrid(x, u).cost, (cfg["x0"], u0)) / iters
        results[label] = {
            "pure_iter_s": t_pure,
            "pure_seq_iter_s": t_seq,
            "hybrid_iter_s": t_hybrid,
            "hybrid_vs_pure_speedup": t_pure / t_hybrid,
            "hybrid_vs_pure_seq_speedup": t_seq / t_hybrid,
        }
    return results


def bench_hybrid_speedup_batched():
    """Hybrid-vs-pure per-iteration in the BATCHED long-horizon regime.

    Single-trajectory latency on this chip is launch-latency-bound (~1.3-1.6
    ms per phase at H=256 regardless of arithmetic — see BASELINE.md), so the
    transformer forward there costs as much as the associative backward it
    replaces. With a trajectory batch the MXU amortizes the transformer to
    <1 ms while the exact backward pass (even the fused kernel) stays the
    dominant phase — this is the regime where the learned head pays off on
    TPU, and the benchmark that demonstrates it.
    """
    from quattro_tpu.models import GainPredictor
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import (
        ILQRConfig,
        hybrid_ilqr_solve,
        make_quadratic_cost,
        make_quadratic_final_cost,
    )
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    h256 = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "checkpoints", "quadrotor_h256_gain.npz")
    if not os.path.exists(h256):
        return {"skipped": "no H256 checkpoint"}
    pred = GainPredictor.load(h256)

    n, m, horizon, batch, iters = 12, 4, 256, 64, 4
    x_ref = jnp.zeros(n).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((m,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]), x_ref
    )
    key = jax.random.PRNGKey(0)
    x0s = (
        jnp.zeros((batch, n), jnp.float32)
        .at[:, 2].set(0.2 + 0.3 * jax.random.uniform(key, (batch,)))
        .at[:, 6].set(0.1)
    )
    u0s = jnp.zeros((batch, horizon, m), jnp.float32)
    cfg = ILQRConfig(tol=0.0, max_iter=iters)

    pure = jax.jit(
        lambda x, u: batched_ilqr_solve(dyn, cost, fcost, x, u, cfg).cost
    )
    predict = pred.predict_fn()
    hybrid = jax.jit(
        jax.vmap(
            lambda x, u: hybrid_ilqr_solve(
                dyn, cost, fcost, predict, pred.prompt_len, x, u, x_ref,
                cfg._replace(riccati="seq"),
            ).cost
        )
    )
    t_pure = _time_pipelined(pure, (x0s, u0s), repeats=5) / iters
    t_hybrid = _time_pipelined(hybrid, (x0s, u0s), repeats=5) / iters
    return {
        f"quadrotor_H{horizon}_B{batch}": {
            "pure_iter_s": t_pure,
            "hybrid_iter_s": t_hybrid,
            "hybrid_vs_pure_speedup": t_pure / t_hybrid,
            "note": "pure = fused-kernel batched solve; hybrid = vmapped "
                    "tail-window + transformer solve, per-iteration seconds "
                    "are for the whole batch",
        }
    }


def bench_batch_throughput():
    from quattro_tpu.parallel import batched_ilqr_solve
    from quattro_tpu.solver import ILQRConfig, make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    x_ref = jnp.zeros(12).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((4,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]), x_ref
    )
    results = {}
    key = jax.random.PRNGKey(0)
    for batch in (64, 512, 2048):
        x0s = jnp.zeros((batch, 12)).at[:, 2].set(
            0.2 + 0.3 * jax.random.uniform(key, (batch,))
        )
        u0s = jnp.zeros((batch, 50, 4))
        for tag, cfg in (
            ("", ILQRConfig(tol=0.0, max_iter=4)),
            # Fully-fused batched iteration: Pallas backward + Pallas
            # all-alpha rollout kernel (linesearch="fused").
            ("_fused_ls", ILQRConfig(tol=0.0, max_iter=4, linesearch="fused")),
        ):
            fn = jax.jit(
                lambda x, u, _c=cfg: batched_ilqr_solve(dyn, cost, fcost, x, u, _c).cost
            )
            elapsed = _time_pipelined(fn, (x0s, u0s), repeats=5)
            results[f"batch_{batch}{tag}"] = {
                "seconds": elapsed,
                "solves_per_sec": batch / elapsed,
            }
    return results


def bench_pod_scale():
    """BASELINE config-5 feed on ONE chip: 4096 trajectories x H=1024.

    The pod-scale config (BASELINE.json north star: 4096 traj, H=1024,
    horizon-partitioned across >=2 hosts) has two orthogonal axes; this
    section measures the per-chip half — aggregate Riccati factorization
    throughput at the full 4096-trajectory feed — so the multi-host table
    (benchmarks/scaling.py) only has to add interconnect cost.

    HBM bounds the resident working set: one chunk of CHUNK trajectories is
    resident (stage data ~420 floats/stage -> 0.9 GB at CHUNK=512 before the
    kernel's pre-permuted layouts), and the 4096-trajectory sweep runs as
    chained chunk dispatches inside one jitted fori_loop (_time_pipelined) —
    exactly how a streaming pipeline would drain it. Each chunk re-reads its
    stage data from HBM, so bytes/trajectory match the distinct-data case.

    Comparators: the fused Pallas kernel (batched-regime dispatch default)
    vs the vmapped sequential scan. Metric: block-nnz/s over the aggregate
    4096 x 1024 KKT factorization.
    """
    from quattro_tpu.ops.fused_riccati import (
        riccati_backward_batched_fused,
        riccati_backward_batched_fused2d,
    )
    from quattro_tpu.solver.riccati import riccati_backward

    n, m, horizon = 12, 4, 1024
    total_traj = 4096

    # Chunk sizes differ per comparator: the fused kernel streams its
    # pre-permuted SoA layout and fits CHUNK=512 comfortably, while the
    # vmapped scan's while-body layouts pad its small per-lane tensors
    # ~14x (measured: 1.09 GB unpadded -> 15.04 GB padded HBM temp at
    # B=512) and OOMs there — so the scan comparator is SWEPT over
    # 64/128/256 (skipping chunks that OOM) and reports its best, to avoid
    # understating the baseline.
    results = {}
    nnz_total = block_nnz(total_traj, horizon)

    def run_chunk(name, chunk):
        n_chunks = total_traj // chunk
        a, b, exp, v_x, v_xx = random_lq_problem(chunk, horizon, n, m)
        if name in ("fused", "fused_bf16", "fused2d", "fused2d_bf16"):
            v_x_b = jnp.broadcast_to(v_x, (chunk, n))
            v_xx_b = jnp.broadcast_to(v_xx, (chunk, n, n))
            # fused_bf16: the r4 tile-sweep winner for the column-major
            # layout — stage inputs streamed bf16 with f32 carry/outputs,
            # tile_b=256/block_t=4 (opt-in: ~1e-3 relative gain error,
            # tests/test_fused_riccati.py).
            # fused2d[_bf16]: the r5 batch2d layout at its full-vreg
            # configs (tile_s=8; bt=2 f32 / bt=4 bf16 stream) — the
            # dispatch pick at chunk >= 1024.
            if name == "fused2d":
                kern = lambda *t: riccati_backward_batched_fused2d(
                    *t, tile_s=8, block_t=2)[0]
            elif name == "fused2d_bf16":
                kern = lambda *t: riccati_backward_batched_fused2d(
                    *t, tile_s=8, block_t=4, stream_dtype=jnp.bfloat16)[0]
            elif name == "fused_bf16":
                kern = lambda *t: riccati_backward_batched_fused(
                    *t, stream_dtype=jnp.bfloat16, tile_b=256, block_t=4)[0]
            else:
                kern = lambda *t: riccati_backward_batched_fused(*t)[0]
            fn = jax.jit(
                lambda aa, bb, ee, _vx=v_x_b, _vxx=v_xx_b, _k=kern:
                _k(aa, bb, ee, _vx, _vxx)
            )
        else:
            fn = jax.jit(
                jax.vmap(
                    lambda aa, bb, ee, _vx=v_x, _vxx=v_xx:
                    riccati_backward(aa, bb, ee, _vx, _vxx).k_seq
                )
            )
        # repeats is fixed (not min(n_chunks, 16)): the per-measurement
        # host-fetch RTT (~26 ms on this rig) amortizes as RTT/repeats into
        # per_chunk, so a chunk-size-dependent repeats count would bias the
        # comparison AGAINST bigger chunks (n_chunks=4 -> +6.5 ms/chunk vs
        # +1.6 at 16). Re-running one chunk 16x keeps bytes/chunk identical
        # (data is re-read from HBM per dispatch either way).
        per_chunk = _time_pipelined(
            lambda *xs, _f=fn: _f(*xs), (a, b, exp), repeats=16,
        )
        total = per_chunk * n_chunks
        return {
            "chunk": chunk,
            "n_chunks": n_chunks,
            "seconds_total_4096xH1024": total,
            "block_nnz_per_sec": nnz_total / total,
            "traj_sweeps_per_sec": total_traj / total,
        }

    results["fused"] = run_chunk("fused", 512)
    try:
        results["fused_bf16_stream"] = run_chunk("fused_bf16", 512)
    except Exception as e:
        results["fused_bf16_stream"] = {"error": type(e).__name__}
    for nm in ("fused2d", "fused2d_bf16"):
        try:
            results[nm] = run_chunk(nm, 1024)
        except Exception as e:
            results[nm] = {"error": type(e).__name__}
    scan_sweep = {}
    for chunk in (64, 128, 256):
        try:
            scan_sweep[str(chunk)] = run_chunk("scan", chunk)
        except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED etc.
            scan_sweep[str(chunk)] = {"chunk": chunk, "error": type(e).__name__}
            print(f"pod_scale scan chunk={chunk}: {type(e).__name__}", flush=True)
    ok = [v for v in scan_sweep.values() if "error" not in v]
    results["scan"] = min(ok, key=lambda v: v["seconds_total_4096xH1024"])
    results["scan_chunk_sweep"] = scan_sweep
    results["shape"] = {
        "total_traj": total_traj, "horizon": horizon, "n": n, "m": m,
        "note": "chained chunk dispatches in one fori_loop; chunk data "
                "resident in HBM and re-read per chunk; total extrapolated "
                "as per_chunk x n_chunks",
    }
    return results


def bench_kernels():
    """Custom-kernel reference points: Pallas vs XLA-fused jnp for the
    batched Q_uu Cholesky-and-solve (see ops/smallchol.py docstring)."""
    from quattro_tpu.ops.smallchol import (
        batched_cholesky_solve,
        batched_cholesky_solve_pallas,
    )

    from quattro_tpu.ops.blocktridiag import BlockTridiagonal, btd_matvec, btd_matvec_pallas

    results = {}
    key = jax.random.PRNGKey(0)
    m, r = 4, 13
    for batch in (4096, 65536, 1048576):
        w = jax.random.normal(key, (batch, m, m), dtype=jnp.float32)
        a = jnp.einsum("bij,bkj->bik", w, w) + 2 * jnp.eye(m)
        b = jax.random.normal(key, (batch, m, r), dtype=jnp.float32)
        f_jnp = jax.jit(lambda a, b: batched_cholesky_solve(a, b)[0])
        f_pl = jax.jit(lambda a, b: batched_cholesky_solve_pallas(a, b))
        results[f"qquu_cholsolve_B{batch}"] = {
            "jnp_unrolled_s": _time_pipelined(f_jnp, (a, b)),
            "pallas_s": _time_pipelined(f_pl, (a, b)),
        }

    # Block-banded SpMV (trajectory-KKT residual evaluation shape).
    n = 12
    for nblocks in (1024, 131072):
        mat = BlockTridiagonal(
            diag=jax.random.normal(key, (nblocks, n, n), dtype=jnp.float32),
            lower=jax.random.normal(key, (nblocks - 1, n, n), dtype=jnp.float32),
        )
        xv = jax.random.normal(key, (nblocks, n), dtype=jnp.float32)
        f_jnp = jax.jit(lambda d, lo, x: btd_matvec(BlockTridiagonal(d, lo), x))
        f_pl = jax.jit(lambda d, lo, x: btd_matvec_pallas(BlockTridiagonal(d, lo), x))
        results[f"btd_matvec_N{nblocks}"] = {
            "jnp_s": _time_pipelined(f_jnp, (mat.diag, mat.lower, xv)),
            "pallas_s": _time_pipelined(f_pl, (mat.diag, mat.lower, xv)),
        }
    return results


def _quadrotor_h100_problem():
    """The headline-bench problem (quadrotor hover, H=100) shared by the
    roofline and fused-latency sections."""
    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics

    n, m, horizon = 12, 4, 100
    x_ref = jnp.zeros(n).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((m,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]), x_ref
    )
    x0 = jnp.zeros(n).at[2].set(0.2).at[6].set(0.1)
    u0 = jnp.zeros((horizon, m))
    return dyn, cost, fcost, x0, u0, n, m, horizon


def bench_fused_latency():
    """Single-trajectory fused Pallas kernels vs their XLA forms.

    (a) backward pass: fused kernel vs associative scan at H=100 / H=1024;
    (b) line search: fused all-alpha rollout kernel vs the vmapped scan;
    (c) end-to-end headline solve (quadrotor H=100, forced 6 iters) across
        the config matrix — this is where bench.py's number comes from.

    NOTE each fused-kernel shape costs ~5 min of Mosaic compile when cold
    (persistent cache applies).
    """
    from quattro_tpu.solver import ILQRConfig, ilqr_solve
    from quattro_tpu.solver.riccati import (
        riccati_backward_associative,
        riccati_backward_fused,
    )
    from quattro_tpu.solver.derivatives import (
        linearize_dynamics,
        quadratize_cost,
        quadratize_final_cost,
    )
    from quattro_tpu.solver.riccati import riccati_backward
    from quattro_tpu.solver.rollout import (
        line_search,
        line_search_fused,
        simulate,
        trajectory_cost,
    )

    results = {}
    n, m = 12, 4
    for label, horizon in (("H100", 100), ("H1024", 1024)):
        a, b, exp, v_x, v_xx = random_lq_problem(1, horizon, n, m)
        f_assoc = jax.jit(
            lambda aa, bb, ee: riccati_backward_associative(aa, bb, ee, v_x, v_xx).k_seq
        )
        f_fused = jax.jit(
            lambda aa, bb, ee: riccati_backward_fused(aa, bb, ee, v_x, v_xx).k_seq
        )
        results[f"riccati_single_{label}"] = {
            "assoc_s": _time_pipelined(lambda *xs: f_assoc(*xs), (a, b, exp)),
            "fused_s": _time_pipelined(lambda *xs: f_fused(*xs), (a, b, exp)),
        }

    dyn, cost, fcost, x0, u0, n, m, horizon = _quadrotor_h100_problem()
    x_seq = simulate(dyn, x0, u0)
    cost0 = trajectory_cost(cost, fcost, x_seq, u0)
    a_seq, b_seq = linearize_dynamics(dyn, x_seq, u0)
    exp = quadratize_cost(cost, x_seq, u0)
    fexp = quadratize_final_cost(fcost, x_seq[-1])
    res = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], dtype=x_seq.dtype)
    f_ls = jax.jit(
        lambda xs, us, k, kk: line_search(
            dyn, cost, fcost, x0, xs, us, k, kk, cost0, alphas
        )[4]
    )
    f_lsf = jax.jit(
        lambda xs, us, k, kk: line_search_fused(
            dyn, cost, fcost, x0, xs, us, k, kk, cost0, alphas
        )[4]
    )
    ls_args = (x_seq, u0, res.k_seq, res.big_k_seq)
    results["line_search_H100"] = {
        "xla_s": _time_pipelined(f_ls, ls_args),
        "fused_s": _time_pipelined(f_lsf, ls_args),
    }

    from quattro_tpu.solver import ilqr_solve_fused

    for label, solve_fn, cfg in (
        ("assoc_xla", ilqr_solve, ILQRConfig(tol=0.0, max_iter=6, riccati="assoc")),
        ("fused_xla", ilqr_solve, ILQRConfig(tol=0.0, max_iter=6, riccati="fused")),
        ("fused_fused", ilqr_solve,
         ILQRConfig(tol=0.0, max_iter=6, riccati="fused", linesearch="fused")),
        ("megakernel", ilqr_solve_fused, ILQRConfig(tol=0.0, max_iter=6)),
    ):
        f_solve = jax.jit(
            lambda xi, _s=solve_fn, _c=cfg: _s(dyn, cost, fcost, xi, u0, _c).cost
        )
        sec = _time_pipelined(f_solve, (x0,))
        results[f"solve_H100_{label}"] = {
            "seconds": sec,
            "iter_per_sec": 6.0 / sec,
        }
    return results


def bench_roofline():
    """Per-phase roofline: analytic FLOPs/bytes vs measured time -> MFU.

    Phases of the headline quadrotor iteration (H=100, n=12, m=4) measured
    in isolation, plus the pod-feed batched Riccati. Peak spec from the
    detected device (v5e here); see quattro_tpu/utils/roofline.py for the
    models and the f32-derate caveat.
    """
    from quattro_tpu.solver import make_quadratic_cost, make_quadratic_final_cost
    from quattro_tpu.solver.derivatives import (
        linearize_dynamics,
        quadratize_cost,
        quadratize_final_cost,
    )
    from quattro_tpu.solver.riccati import riccati_backward
    from quattro_tpu.solver.rollout import line_search, simulate, trajectory_cost
    from quattro_tpu.systems import make_discrete, quadrotor_dynamics
    from quattro_tpu.utils import roofline

    peak = roofline.PEAKS["tpu-v5p" if "v5p" in str(jax.devices()[0]).lower() else "tpu-v5e"]
    n, m, horizon = 12, 4, 100
    x_ref = jnp.zeros(n).at[2].set(0.5)
    dyn = make_discrete(quadrotor_dynamics, 0.01, "rk4")
    cost = make_quadratic_cost(
        jnp.array([10.0, 10.0, 50.0, 1, 1, 1, 10.0, 10.0, 50.0, 1, 1, 1]),
        jnp.full((m,), 0.01), x_ref, barrier_alpha=1000.0,
    )
    fcost = make_quadratic_final_cost(
        jnp.array([100.0, 100.0, 500.0, 10, 10, 10, 100.0, 100.0, 500.0, 10, 10, 10]), x_ref
    )
    x0 = jnp.zeros(n).at[2].set(0.2).at[6].set(0.1)
    u0 = jnp.zeros((horizon, m))
    x_seq = simulate(dyn, x0, u0)
    cost0 = trajectory_cost(cost, fcost, x_seq, u0)
    dynf = roofline.QUADROTOR_DYN_FLOPS

    f_lin = jax.jit(lambda xs, us: linearize_dynamics(dyn, xs, us)[0])
    t_lin = _time_pipelined(f_lin, (x_seq, u0))

    a_seq, b_seq = linearize_dynamics(dyn, x_seq, u0)
    exp = quadratize_cost(cost, x_seq, u0)
    fexp = quadratize_final_cost(fcost, x_seq[-1])
    f_ric = jax.jit(
        lambda aa, bb, ee: riccati_backward(aa, bb, ee, fexp.v_x, fexp.v_xx).k_seq
    )
    t_ric = _time_pipelined(lambda aa, bb, ee: f_ric(aa, bb, ee), (a_seq, b_seq, exp))

    res = riccati_backward(a_seq, b_seq, exp, fexp.v_x, fexp.v_xx)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.01], dtype=x_seq.dtype)
    f_ls = jax.jit(
        lambda xs, us, k, kk: line_search(
            dyn, cost, fcost, x0, xs, us, k, kk, cost0, alphas
        )[4]
    )
    t_ls = _time_pipelined(f_ls, (x_seq, u0, res.k_seq, res.big_k_seq))

    out = {
        "peak_spec": {"name": peak.name, "bf16_tflops": peak.matmul_bf16_flops / 1e12,
                      "hbm_gbps": peak.hbm_bytes / 1e9,
                      "f32_peak_is_estimate": True},
        "linearize_H100": roofline.report(
            roofline.linearize_flops(horizon, n, m, dynf),
            horizon * (n + m + n * (n + m)) * 4.0, t_lin, peak,
        ),
        "riccati_seq_H100": roofline.report(
            roofline.riccati_flops(horizon, n, m),
            roofline.riccati_bytes(horizon, n, m, carry_in_hbm=True), t_ric, peak,
        ),
        "line_search_H100": roofline.report(
            roofline.rollout_flops(horizon, n, m, dynf),
            horizon * (n + m + m * n) * 6 * 4.0, t_ls, peak,
        ),
    }

    # Pod-feed batched Riccati: vmapped scan vs the fused Pallas kernel.
    from quattro_tpu.ops.fused_riccati import riccati_backward_batched_fused

    batch, bh = 64, 1024
    a, b, exp_b, v_x, v_xx = random_lq_problem(batch, bh, n, m)
    v_x_b = jnp.broadcast_to(v_x, (batch, n))
    v_xx_b = jnp.broadcast_to(v_xx, (batch, n, n))
    flops = roofline.riccati_flops(bh, n, m, batch)
    f_scan = jax.jit(
        jax.vmap(lambda aa, bb, ee: riccati_backward(aa, bb, ee, v_x, v_xx).k_seq)
    )
    t_scan = _time_pipelined(lambda aa, bb, ee: f_scan(aa, bb, ee), (a, b, exp_b), repeats=5)
    out["riccati_podfeed_scan"] = roofline.report(
        flops, roofline.riccati_bytes(bh, n, m, batch, carry_in_hbm=True), t_scan, peak
    )
    f_fused = jax.jit(
        lambda aa, bb, ee: riccati_backward_batched_fused(aa, bb, ee, v_x_b, v_xx_b)[0]
    )
    t_fused = _time_pipelined(lambda aa, bb, ee: f_fused(aa, bb, ee), (a, b, exp_b), repeats=5)
    out["riccati_podfeed_fused"] = roofline.report(
        flops, roofline.riccati_bytes(bh, n, m, batch), t_fused, peak
    )
    return out


def main():
    # Persistent compile cache: the fused backward kernel takes ~5 min of
    # Mosaic compile per shape; cache it across benchmark processes.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_tpu_cache"),
        )
    except Exception:
        pass

    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument(
        "--only", default=None,
        choices=["riccati", "hybrid", "hybrid_batched", "batch", "pod_scale",
                 "kernels", "fused_latency", "roofline"],
        help="run one section",
    )
    args = parser.parse_args()

    out = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    if args.only in (None, "riccati"):
        out["riccati_blocknnz"] = bench_riccati_blocknnz()
        print(json.dumps({"riccati_blocknnz": out["riccati_blocknnz"]}, indent=2), flush=True)
    if args.only in (None, "hybrid"):
        out["hybrid_speedup"] = bench_hybrid_speedup()
        print(json.dumps({"hybrid_speedup": out["hybrid_speedup"]}, indent=2), flush=True)
    if args.only in (None, "hybrid_batched"):
        out["hybrid_speedup_batched"] = bench_hybrid_speedup_batched()
        print(json.dumps({"hybrid_speedup_batched": out["hybrid_speedup_batched"]}, indent=2), flush=True)
    if args.only in (None, "batch"):
        out["batch_throughput"] = bench_batch_throughput()
        print(json.dumps({"batch_throughput": out["batch_throughput"]}, indent=2), flush=True)
    if args.only in (None, "pod_scale"):
        out["pod_scale"] = bench_pod_scale()
        print(json.dumps({"pod_scale": out["pod_scale"]}, indent=2), flush=True)
    if args.only in (None, "kernels"):
        out["kernels"] = bench_kernels()
        print(json.dumps({"kernels": out["kernels"]}, indent=2), flush=True)
    if args.only in (None, "fused_latency"):
        out["fused_latency"] = bench_fused_latency()
        print(json.dumps({"fused_latency": out["fused_latency"]}, indent=2), flush=True)
    if args.only in (None, "roofline"):
        out["roofline"] = bench_roofline()
        print(json.dumps({"roofline": out["roofline"]}, indent=2), flush=True)

    if args.json:
        # Merge into an existing results file so `--only <section>` refreshes
        # one table without discarding the rest.
        merged = {}
        if os.path.exists(args.json):
            try:
                with open(args.json) as f:
                    merged = json.load(f)
            except (json.JSONDecodeError, OSError):
                merged = {}
        merged.update(out)
        with open(args.json, "w") as f:
            json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
