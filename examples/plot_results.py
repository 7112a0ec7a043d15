"""Generate the closed-loop result figures (reference: figures/*_result.png).

The reference's performance evidence is a pair of result figures
(README.md:29; figures/cartpole_result.png, figures/quadrotor_result.png).
This script recreates that evidence for quattro_tpu: it runs the headless
MuJoCo sim harnesses (examples/cartpole_sim.py, examples/quadrotor_sim.py)
in pure-iLQR and hybrid (transformer) modes with the shipped checkpoints and
plots the closed-loop trajectories side by side.

Usage:
    python examples/plot_results.py            # run sims + plot
    python examples/plot_results.py --no-run   # plot from existing npz logs
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Categorical palette (validated adjacent-pair CVD-safe order, light surface).
C_ILQR = "#2a78d6"  # slot 1, blue  — pure iLQR
C_HYBRID = "#eb6834"  # slot 2, orange — hybrid (transformer)
C_REF_LINE = "#8a8a85"  # neutral: targets / zero lines
INK = "#1a1a19"
INK_2 = "#5f5e58"
GRID = "#e7e6e2"


def _style(ax, title, ylabel):
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.set_ylabel(ylabel, fontsize=9, color=INK_2)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.tick_params(colors=INK_2, labelsize=8)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)


def _run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT)


def collect(tmp):
    cp_ckpt = os.path.join(ROOT, "checkpoints", "cartpole_gain.npz")
    qr_ckpt = os.path.join(ROOT, "checkpoints", "quadrotor_gain.npz")
    py = sys.executable
    _run([py, "examples/cartpole_sim.py", "--mode", "ilqr", "--steps", "800",
          "--angle", "0.2", "--log", os.path.join(tmp, "cp_ilqr.npz")])
    _run([py, "examples/cartpole_sim.py", "--mode", "hybrid", "--steps", "800",
          "--angle", "0.2", "--checkpoint", cp_ckpt,
          "--log", os.path.join(tmp, "cp_hybrid.npz")])
    _run([py, "examples/quadrotor_sim.py", "--mode", "ilqr", "--steps", "4000",
          "--z", "0.2", "--roll", "0.1", "--log", os.path.join(tmp, "qr_ilqr.npz")])
    _run([py, "examples/quadrotor_sim.py", "--mode", "hybrid", "--steps", "4000",
          "--z", "0.2", "--roll", "0.1", "--checkpoint", qr_ckpt,
          "--log", os.path.join(tmp, "qr_hybrid.npz")])


def plot_cartpole(tmp, out):
    import matplotlib.pyplot as plt

    ilqr = np.load(os.path.join(tmp, "cp_ilqr.npz"))
    hyb = np.load(os.path.join(tmp, "cp_hybrid.npz"))
    dt = 0.01  # plant step (examples/cartpole_sim.py)

    fig, axes = plt.subplots(3, 1, figsize=(7.2, 6.4), sharex=True)
    panels = [
        ("Pole angle", "rad", lambda d: d["states"][:, 2]),
        ("Cart position", "m", lambda d: d["states"][:, 0]),
        ("Control force", "N", lambda d: d["controls"]),
    ]
    for ax, (title, unit, get) in zip(axes, panels):
        t = np.arange(len(get(ilqr))) * dt
        ax.axhline(0.0, color=C_REF_LINE, linewidth=1.0, linestyle="--")
        # The two controllers track near-identically; width + dash keep both
        # visible (and identity is not color-alone).
        ax.plot(t, get(ilqr), color=C_ILQR, linewidth=3.2, label="pure iLQR")
        ax.plot(np.arange(len(get(hyb))) * dt, get(hyb), color=C_HYBRID,
                linewidth=1.6, linestyle=(0, (4, 2)), label="hybrid (transformer)")
        _style(ax, title, unit)
    axes[0].legend(loc="upper right", fontsize=8, frameon=False, labelcolor=INK)
    axes[-1].set_xlabel("time [s]", fontsize=9, color=INK_2)
    fig.suptitle("Cart-pole MPC, closed loop vs the MuJoCo plant (H=30, dt=10 ms)",
                 fontsize=11, color=INK, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    fig.savefig(out, dpi=150)
    print("wrote", out)


def plot_quadrotor(tmp, out):
    import matplotlib.pyplot as plt

    ilqr = np.load(os.path.join(tmp, "qr_ilqr.npz"))
    hyb = np.load(os.path.join(tmp, "qr_hybrid.npz"))
    dt = 0.02  # one logged state per MPC call (decimation 20 x 1 ms)

    fig, axes = plt.subplots(3, 1, figsize=(7.2, 6.4), sharex=True)
    panels = [
        ("Altitude", "m", lambda d: d["states"][:, 2], 0.5),
        ("Roll", "rad", lambda d: d["states"][:, 6], 0.0),
        ("Horizontal position y", "m", lambda d: d["states"][:, 1], 0.0),
    ]
    for ax, (title, unit, get, ref) in zip(axes, panels):
        ax.axhline(ref, color=C_REF_LINE, linewidth=1.0, linestyle="--")
        ax.plot(np.arange(len(get(ilqr))) * dt, get(ilqr), color=C_ILQR,
                linewidth=3.2, label="pure iLQR")
        ax.plot(np.arange(len(get(hyb))) * dt, get(hyb), color=C_HYBRID,
                linewidth=1.6, linestyle=(0, (4, 2)), label="hybrid (transformer)")
        _style(ax, title, unit)
    axes[0].legend(loc="lower right", fontsize=8, frameon=False, labelcolor=INK)
    axes[-1].set_xlabel("time [s]", fontsize=9, color=INK_2)
    fig.suptitle("Quadrotor hover MPC, closed loop vs the MuJoCo plant (H=50, MPC every 20 ms)",
                 fontsize=11, color=INK, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    fig.savefig(out, dpi=150)
    print("wrote", out)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--no-run", action="store_true",
                        help="plot from existing npz logs in --tmp")
    parser.add_argument("--tmp", default="/tmp/quattro_tpu_sim_logs")
    parser.add_argument("--out", default=os.path.join(ROOT, "figures"))
    args = parser.parse_args()

    os.makedirs(args.tmp, exist_ok=True)
    os.makedirs(args.out, exist_ok=True)
    if not args.no_run:
        collect(args.tmp)
    plot_cartpole(args.tmp, os.path.join(args.out, "cartpole_result.png"))
    plot_quadrotor(args.tmp, os.path.join(args.out, "quadrotor_result.png"))


if __name__ == "__main__":
    main()
