"""Scaling-efficiency benchmark: Riccati factorization throughput vs mesh size.

The north-star build target (BASELINE.json / BASELINE.md) is >= 80%
block-nnz/s efficiency going 1 chip -> 1 host -> N hosts. This harness
measures exactly that curve for the three sharded factorization paths:

1. ``traj``     trajectory-batch axis (embarrassingly parallel, P1):
                vmapped sequential Riccati, batch sharded over ``traj``.
2. ``horizon``  time-axis partitioning (P6): ``sharded_riccati_backward`` —
                local suffix scans + boundary value-element halo exchange.
3. ``podscale`` the 2D combined sharding (BASELINE config 5 shape, scaled to
                the available device count).

Strong scaling on a fixed problem. Two baselines per path:

- ``t_same(1)``: the SAME sharded algorithm on a 1-device mesh — isolates
  partitioning cost (halo exchange, shard_map overhead, per-shard load).
- ``t_best(1)``: the best single-device implementation (plain/vmapped
  sequential scan) — the honest absolute yardstick.

Efficiency reporting adapts to the host (the ``metric_mode`` field):

- ``parallel`` (host cores >= mesh size, or real multi-chip):
  ``efficiency(D) = t(1) / (D * t(D))`` — true strong scaling.
- ``timeshared`` (this rig's CPU: ONE core hosting all virtual devices —
  D devices time-slice a core, so wall-clock can never drop): report
  ``projected_efficiency(D) = t_same(1) / t(D)`` — the inverse of the total
  work inflation partitioning D ways costs. On D real devices the same
  schedule would reach ~ that efficiency (upper bound: virtual-mesh
  "communication" is shared-memory memcpy, cheaper than ICI).

Hardware note: this rig has ONE real TPU chip, so the mesh sweep runs on a
CPU-emulated mesh (``--backend cpu --devices 8``, the same
``xla_force_host_platform_device_count`` trick the tests use). Those numbers
validate the ALGORITHM's scaling (collective schedule, halo volume, load
balance) and regression-guard it in CI; absolute device rates come from
``--backend tpu --devices 1`` (the "1 chip" column of the north-star curve)
and real-pod numbers slot into the same table when multi-chip hardware
exists.

Usage:
  python benchmarks/scaling.py --backend cpu --devices 8 [--quick] [--json f]
  python benchmarks/scaling.py --backend tpu --devices 1 [--json f]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, ".."))


# Interconnect parameter sets for the analytic projection. Public
# figures (approximate, from the "How to Scale Your Model" book's v5p
# chapter and TPU system papers): v5p ICI ~90 GB/s per link per direction
# with ~1 us neighbor-hop latency; cross-slice DCN ~25 GB/s per host with
# ~10 us latency. The halo payload (~1-2 KB) makes every hop LATENCY-bound,
# so the hop count (tree: ceil(log2 D)+1) dominates and the bandwidth terms
# are almost irrelevant — which is exactly why the ppermute schedule
# minimizes rounds, not bytes.
INTERCONNECTS = {
    "v5p_ici": {"latency_s": 1e-6, "bandwidth_bytes_per_s": 90e9},
    "dcn": {"latency_s": 10e-6, "bandwidth_bytes_per_s": 25e9},
}


def analytic_projection(
    t_part1: float,
    t_best1: float,
    horizon: int,
    n: int,
    batch_rows: int = 1,
    split_rule=None,
    dtype_bytes: int = 4,
    dev_counts=(2, 4, 8, 16, 32, 64),
    mode: str = "tree",
) -> dict:
    """Predicted strong-scaling efficiency of the horizon-partitioned
    backward pass on REAL interconnects — the half of the >=80% target this
    rig cannot measure (one chip; the CPU mesh time-shares a core).

    Model: t(D) = t_part1/D  (the partitioned algorithm's work divides
    cleanly — measured super-unity projected efficiencies on the virtual
    mesh confirm zero redundant compute)
           + rounds(D) * t_combine  (the cross-device combines are serial)
           + rounds(D) * (hop_latency + payload/bandwidth).

    ``t_combine`` is calibrated from the measurement itself: the 1-device
    partitioned run executes ~H combines in t_part1, so one combine costs
    ~t_part1/H. Payload bytes and round counts come from
    ``halo_schedule_spec`` — the same contract the lowering test pins to the
    compiled HLO. Efficiency vs the best single-device implementation is the
    honest number: eff(D) = t_best1 / (D * t(D)).

    ``split_rule(d) -> (traj_axis, horizon_axis)`` describes how ``d``
    devices are partitioned (default ``(1, d)`` — pure horizon sharding).
    Rounds come from the HORIZON-axis size only, and the per-hop payload is
    one value element per LOCALLY-resident trajectory row
    (``ceil(batch_rows / traj_axis)``) — a 2-D podscale mesh exchanges its
    batch shard's boundary elements along the horizon axis, never across
    both axes.
    """
    from quattro_tpu.parallel.horizon import halo_schedule_spec

    if split_rule is None:
        split_rule = lambda d: (1, d)
    t_combine = t_part1 / max(horizon, 1)
    out = {
        "model": "t(D) = t_part1/D + rounds*(t_combine + hop_lat + payload/bw)",
        "t_part1_s": t_part1,
        "t_best1_s": t_best1,
        "t_combine_s": t_combine,
        "mode": mode,
        "interconnects": {},
    }
    dtype = "float32" if dtype_bytes == 4 else "float64"
    for name, params in INTERCONNECTS.items():
        table = {}
        max80 = 0
        for d in dev_counts:
            t_ax, h_ax = split_rule(d)
            local_rows = max(-(-batch_rows // t_ax), 1)
            spec = halo_schedule_spec(n, dtype, h_ax, mode) if h_ax > 1 else {
                "payload_bytes_per_hop": 0, "rounds": 0,
            }
            payload = spec["payload_bytes_per_hop"] * local_rows
            t_comm = spec["rounds"] * (
                params["latency_s"] + payload / params["bandwidth_bytes_per_s"]
            )
            t_d = t_part1 / d + spec["rounds"] * t_combine + t_comm
            eff_best = t_best1 / (d * t_d)
            eff_same = t_part1 / (d * t_d)
            table[str(d)] = {
                "mesh": {"traj": t_ax, "horizon": h_ax},
                "rounds": spec["rounds"],
                "halo_bytes_per_hop": payload,
                "t_comm_s": t_comm,
                "t_predicted_s": t_d,
                "efficiency_vs_best_1dev": eff_best,
                "efficiency_vs_same_algo": eff_same,
            }
            if eff_best >= 0.8:
                max80 = max(max80, d)
        out["interconnects"][name] = {
            "params": params,
            "per_device_count": table,
            "max_devices_with_eff_vs_best_ge_80pct": max80,
        }
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke)")
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from suite import _time_pipelined, block_nnz, random_lq_problem
    from quattro_tpu.parallel.horizon import sharded_riccati_backward
    from quattro_tpu.parallel.mesh import make_mesh
    from quattro_tpu.parallel.podscale import podscale_riccati_backward
    from quattro_tpu.solver.derivatives import CostExpansion
    from quattro_tpu.solver.riccati import riccati_backward
    from jax.sharding import NamedSharding, PartitionSpec

    ndev = min(args.devices, len(jax.devices()))
    dev_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    try:
        host_cores = len(os.sched_getaffinity(0))
    except AttributeError:
        host_cores = os.cpu_count() or 1
    timeshared = args.backend == "cpu" and host_cores < max(dev_counts)
    n, m = 12, 4
    if args.quick:
        traj_shape = (16, 64)  # (B, H)
        horizon_h = 256
        pod_shape = (8, 128)
        repeats = 3
    else:
        traj_shape = (128, 256)
        horizon_h = 2048
        pod_shape = (64, 1024)  # BASELINE config-5 feed shape per H=1024
        repeats = 5

    out = {
        "backend": jax.default_backend(),
        "devices_available": len(jax.devices()),
        "host_cores": host_cores,
        "metric_mode": "timeshared" if timeshared else "parallel",
        "shapes": {
            "traj": {"batch": traj_shape[0], "horizon": traj_shape[1], "n": n, "m": m},
            "horizon": {"batch": 1, "horizon": horizon_h, "n": n, "m": m},
            "podscale": {"batch": pod_shape[0], "horizon": pod_shape[1], "n": n, "m": m},
        },
    }

    def efficiency_table(times, nnz, t_best1):
        """times: {D: seconds with the sharded algo}; times[1] = t_same(1)."""
        t_same1 = times[1]
        table = {}
        for d, t in times.items():
            if timeshared:
                eff = t_same1 / t  # projected: inverse work inflation
                eff_best = t_best1 / t
            else:
                eff = t_same1 / (d * t)
                eff_best = t_best1 / (d * t)
            table[str(d)] = {
                "seconds": t,
                "block_nnz_per_sec": nnz / t,
                "projected_efficiency" if timeshared else "efficiency": eff,
                "vs_best_1dev": eff_best,
            }
        table["best_1dev_seconds"] = t_best1
        return table

    # ---- 1) trajectory-axis strong scaling -------------------------------
    batch, horizon = traj_shape
    a, b, exp, v_x, v_xx = random_lq_problem(batch, horizon, n, m)
    times = {}
    for d in dev_counts:
        mesh = make_mesh((d,), ("traj",), devices=jax.devices()[:d])
        shard = NamedSharding(mesh, PartitionSpec("traj"))
        a_s = jax.device_put(a, shard)
        b_s = jax.device_put(b, shard)
        exp_s = jax.tree.map(lambda x: jax.device_put(x, shard), exp)

        fn = jax.jit(
            jax.vmap(lambda aa, bb, ee: riccati_backward(aa, bb, ee, v_x, v_xx).k_seq)
        )
        times[d] = _time_pipelined(lambda aa, bb, ee: fn(aa, bb, ee), (a_s, b_s, exp_s), repeats=repeats)
        print(f"traj D={d}: {times[d]*1e3:.2f} ms", flush=True)
    # Same algorithm at every D (only the sharding differs): best == same.
    out["traj_scaling"] = efficiency_table(times, block_nnz(batch, horizon), times[1])

    # ---- 2) horizon-axis strong scaling ----------------------------------
    a, b, exp, v_x, v_xx = random_lq_problem(1, horizon_h, n, m)
    best_fn = jax.jit(
        lambda aa, bb, *ef: riccati_backward(aa, bb, CostExpansion(*ef), v_x, v_xx).k_seq
    )
    t_best1 = _time_pipelined(best_fn, (a, b, *exp), repeats=repeats)
    print(f"horizon best-1dev (seq scan): {t_best1*1e3:.2f} ms", flush=True)
    times = {}
    for d in dev_counts:
        mesh = make_mesh((d,), ("horizon",), devices=jax.devices()[:d])

        def run(aa, bb, *exp_fields):
            return sharded_riccati_backward(
                mesh, aa, bb, CostExpansion(*exp_fields), v_x, v_xx
            ).k_seq

        fn = jax.jit(run)
        times[d] = _time_pipelined(fn, (a, b, *exp), repeats=repeats)
        print(f"horizon D={d}: {times[d]*1e3:.2f} ms", flush=True)
    out["horizon_scaling"] = efficiency_table(times, block_nnz(1, horizon_h), t_best1)
    # Analytic ICI/DCN projection from the measured 1-device times: the
    # interconnect half of the >=80% target, modelled since this rig cannot
    # measure real multi-chip hops.
    #
    # Since the r5 condensing restructure, the D=1 partitioned wall-clock
    # DEAD-CODE-ELIMINATES phase 1 (the local condensing fold): at D=1 the
    # halo result is the constant identity, so XLA drops the fold and only
    # the plain block Riccati (phase 3) runs — which is the honest D=1
    # time, but NOT the honest per-device compute slice for D > 1, where
    # every device runs fold + solve on its block. The fold is measured
    # standalone here and added into the projection's compute term.
    from quattro_tpu.parallel.horizon import _local_block_element
    from quattro_tpu.solver.riccati import (
        _stage_elements_with_factors,
        _terminal_element,
    )

    def fold_fn(aa, bb, *exp_fields):
        exp_ = CostExpansion(*exp_fields)
        elems, b_f, p_f = _stage_elements_with_factors(aa, bb, exp_, 1e-6)
        return _local_block_element(
            elems, b_f, p_f, _terminal_element(v_x, v_xx)
        ).j

    t_fold1 = _time_pipelined(jax.jit(fold_fn), (a, b, *exp), repeats=repeats)
    print(f"horizon condensing fold alone: {t_fold1*1e3:.2f} ms", flush=True)
    out["horizon_scaling"]["t_fold1_seconds"] = t_fold1
    out["horizon_scaling"]["analytic_projection"] = analytic_projection(
        times[1] + t_fold1, t_best1, horizon_h, n
    )

    # ---- 3) 2D podscale (traj x horizon) ---------------------------------
    batch, horizon = pod_shape
    a, b, exp, v_x, v_xx = random_lq_problem(batch, horizon, n, m)
    v_x_b = jnp.broadcast_to(v_x, (batch, n))
    v_xx_b = jnp.broadcast_to(v_xx, (batch, n, n))
    best_fn = jax.jit(
        jax.vmap(
            lambda a1, b1, e1: riccati_backward(a1, b1, e1, v_x, v_xx).k_seq
        )
    )
    t_best1 = _time_pipelined(
        lambda aa, bb, ee: best_fn(aa, bb, ee), (a, b, exp), repeats=repeats
    )
    print(f"podscale best-1dev (vmapped seq scan): {t_best1*1e3:.2f} ms", flush=True)
    times = {}
    for d in dev_counts:
        # Split devices between axes: favor traj (cheap) but keep >= 2 on
        # horizon once possible, exercising both collective paths.
        h_axis = 1 if d < 4 else 2 if d < 16 else 4
        t_axis = d // h_axis
        mesh = make_mesh((t_axis, h_axis), ("traj", "horizon"), devices=jax.devices()[:d])

        def run(aa, bb, *exp_fields):
            return podscale_riccati_backward(
                mesh, aa, bb, CostExpansion(*exp_fields), v_x_b, v_xx_b
            ).k_seq

        fn = jax.jit(run)
        times[d] = _time_pipelined(fn, (a, b, *exp), repeats=repeats)
        print(f"podscale D={d} (traj={t_axis} x horizon={h_axis}): {times[d]*1e3:.2f} ms", flush=True)
    out["podscale_scaling"] = efficiency_table(times, block_nnz(batch, horizon), t_best1)
    # 2-D mesh projection with the harness's own device split rule: rounds
    # from the horizon-axis size, payload from the locally-resident batch
    # shard riding each horizon hop.
    def pod_split(d):
        h_ax = 1 if d < 4 else 2 if d < 16 else 4
        return d // h_ax, h_ax

    out["podscale_scaling"]["analytic_projection"] = analytic_projection(
        times[1], t_best1, horizon, n, batch_rows=batch, split_rule=pod_split,
    )

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
