#!/usr/bin/env python3
"""Head-to-head throughput figure: reference CPU vs tpuwave on one TPU chip.

Reads the reference's published strong-scaling wall times (BASELINE.md,
report/sections/8_Scalability.tex:49-53 + the p=32 rows of its
scalability-results.csv) and our measured single-chip times
(analysis/data/scalability-results-1.csv, f32 grid-stencil fast path) on
the identical configuration: standing mode, Nel=640 P1 (410,881 DoF),
dt=8e-5, T=0.05, IO off. Bars show DoF*steps/s on a log axis.

Usage: python analysis/headline_comparison.py [out.png]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent

DOF = 410_881
REF_STEPS = 625   # reference loop count for T=0.05 at dt=8e-5
OUR_STEPS = 626   # ours logs 626 (while time < T with fp accumulation)

# reference wall-clock seconds (min of 3 repeats)
REF_SERIAL = {"theta-0.0": 668.5, "theta-0.5": 624.9, "theta-1.0": 624.9,
              "newmark-0.00": 330.2, "newmark-0.25": 296.3}
REF_BEST = {"theta-0.0": (58.0, 16), "theta-0.5": (37.09, 32),
            "theta-1.0": (54.6, 16), "newmark-0.00": (22.45, 32),
            "newmark-0.25": (20.02, 32)}

LABELS = {"theta-0.0": "FE (θ=0)", "theta-0.5": "CN (θ=0.5)",
          "theta-1.0": "BE (θ=1)", "newmark-0.00": "Newmark β=0",
          "newmark-0.25": "Newmark β=0.25"}

# validated categorical palette, fixed slot order (dataviz reference)
C_SERIAL, C_BEST, C_TPU = "#2a78d6", "#eb6834", "#1baf7a"
INK, MUTED = "#333333", "#777777"


def load_ours() -> dict:
    df = pd.read_csv(REPO / "analysis/data/scalability-results-1.csv")
    best = df.groupby("scheme").seconds.min()
    return best.to_dict()


def main(out: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ours = load_ours()
    schemes = list(LABELS)
    ref1 = [DOF * REF_STEPS / REF_SERIAL[s] for s in schemes]
    refb = [DOF * REF_STEPS / REF_BEST[s][0] for s in schemes]
    tpu = [DOF * OUR_STEPS / ours[s] for s in schemes]

    fig, ax = plt.subplots(figsize=(8.6, 4.2))
    y = range(len(schemes))
    h = 0.26
    gap = 0.03  # visual spacer between adjacent bars
    ax.barh([i + h + gap for i in y], ref1, h, color=C_SERIAL,
            label="reference, 1 MPI rank")
    ax.barh(list(y), refb, h, color=C_BEST,
            label="reference, best (16/32 ranks)")
    ax.barh([i - h - gap for i in y], tpu, h, color=C_TPU,
            label="tpuwave, 1 TPU v5e chip")

    for i, s in enumerate(schemes):
        ax.text(tpu[i] * 1.15, i - h - gap,
                f"{tpu[i]:.2g}  ({tpu[i] / refb[i]:,.0f}× best)",
                va="center", fontsize=8, color=INK)

    ax.set_xscale("log")
    ax.set_xlim(1e5, 2e10)
    ax.set_yticks(list(y), [LABELS[s] for s in schemes], color=INK)
    ax.set_xlabel("throughput, DoF·steps/s  (410,881 DoF, dt=8e-5, T=0.05)",
                  color=INK)
    ax.invert_yaxis()
    ax.grid(True, axis="x", which="both", alpha=0.25)
    ax.spines[["top", "right"]].set_visible(False)
    ax.tick_params(colors=MUTED)
    ax.legend(fontsize=8, loc="lower right", frameon=False)
    ax.set_title("Strong-scaling benchmark: reference CPU vs tpuwave "
                 "single chip", fontsize=10, color=INK)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        REPO / "analysis/figures/throughput-comparison.png"
    main(dest)
