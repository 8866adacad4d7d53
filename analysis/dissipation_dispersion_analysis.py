#!/usr/bin/env python3
"""Dissipation/dispersion analysis.

Script equivalent of the reference's
analysis/dissipation-dispersion-analysis.ipynb: per-scheme E(t)/E(0)
curves from the energy time-series (dissipation), probe-vs-exact-cosine
overlay at the domain centre (dispersion/phase error), and the
energy-ratio summary table per dt.

Usage:
    python analysis/dissipation_dispersion_analysis.py \
        dissdisp-results.csv [series-dir-prefix]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd


def main():
    results = sys.argv[1] if len(sys.argv) > 1 else "dissdisp-results.csv"
    prefix = sys.argv[2] if len(sys.argv) > 2 else "dissdisp"
    out_dir = Path("analysis-out")
    out_dir.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(results)
    print("Energy ratios E(T)/E(0):")
    print(df.pivot_table(index="dt", columns="scheme",
                         values="energy_ratio").to_string())

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # --- dissipation: E(t)/E(0) per scheme ---
    energy_dir = Path(f"{prefix}-energy-series")
    if energy_dir.exists():
        schemes = sorted({f.name.split("_dt")[0]
                          for f in energy_dir.glob("*.csv")})
        fig, axes = plt.subplots(1, max(len(schemes), 1),
                                 figsize=(4 * max(len(schemes), 1), 3.5),
                                 squeeze=False)
        for ax, scheme in zip(axes[0], schemes):
            for f in sorted(energy_dir.glob(f"{scheme}_dt*.csv")):
                s = pd.read_csv(f)
                if len(s) and s.energy.iloc[0] > 0:
                    dt = f.stem.split("_dt")[1]
                    ax.plot(s.time, s.energy / s.energy.iloc[0],
                            label=f"dt={dt}", lw=0.9)
            ax.set(title=scheme, xlabel="t", ylabel="E(t)/E(0)")
            ax.grid(alpha=0.3)
            ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(out_dir / "energy-ratio.png", dpi=130)
        plt.close(fig)

    # --- dispersion: probe vs exact cosine (standing mode:
    #     u(center, t) = cos(sqrt(2) pi t) * sin(pi/2)^2 ) ---
    probe_dir = Path(f"{prefix}-probe-series")
    if probe_dir.exists():
        files = sorted(probe_dir.glob("*.csv"))
        if files:
            fig, ax = plt.subplots(figsize=(9, 3.5))
            tmax = 0.0
            for f in files[:6]:
                s = pd.read_csv(f)
                ax.plot(s.time, s.u_probe, lw=0.8, label=f.stem)
                tmax = max(tmax, float(s.time.max()))
            tt = np.linspace(0, tmax, 800)
            ax.plot(tt, np.cos(math.sqrt(2) * math.pi * tt), "k--",
                    alpha=0.5, lw=1.0, label="exact cos(sqrt(2) pi t)")
            ax.set(xlabel="t", ylabel="u(center, t)", title="probe vs exact")
            ax.grid(alpha=0.3)
            ax.legend(fontsize=6)
            fig.tight_layout()
            fig.savefig(out_dir / "probe-dispersion.png", dpi=130)
            plt.close(fig)

    print(f"Figures in {out_dir}/")


if __name__ == "__main__":
    main()
