#!/usr/bin/env python3
"""Strong-scaling analysis: speedup / efficiency / throughput.

Script equivalent of the reference's analysis/scalability-analisys.ipynb:
min-over-repeats dedup (notebook cell 3), speedup S(p) = T(1)/T(p),
efficiency E(p) = S(p)/p (cell 4), and the three-panel
time/speedup/efficiency figure. Also reports DoF*steps/s throughput,
comparable against BASELINE.md.

Usage: python analysis/scalability_analysis.py scalability-results-8.csv
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd


def load(paths) -> pd.DataFrame:
    df = pd.concat([pd.read_csv(p) for p in paths], ignore_index=True)
    # min over repeats per (scheme, nprocs)
    best = (df.groupby(["scheme", "nprocs", "Nel", "Dt", "T"], as_index=False)
              .seconds.min())
    return best


def analyze(best: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for scheme, g in best.groupby("scheme"):
        g = g.sort_values("nprocs")
        t1_rows = g[g.nprocs == g.nprocs.min()]
        t1 = float(t1_rows.seconds.iloc[0])
        p1 = int(t1_rows.nprocs.iloc[0])
        for _, r in g.iterrows():
            nel = int(r.Nel)
            n_dofs = (nel + 1) ** 2
            n_steps = round(float(r["T"]) / float(r.Dt))
            rows.append({
                "scheme": scheme, "p": int(r.nprocs), "seconds": r.seconds,
                "speedup": t1 * p1 / r.seconds / p1,
                "efficiency": (t1 / r.seconds) * (p1 / int(r.nprocs)),
                "dof_steps_per_s": n_dofs * n_steps / r.seconds,
            })
    return pd.DataFrame(rows)


def plots(res: pd.DataFrame, out_dir: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for scheme, g in res.groupby("scheme"):
        g = g.sort_values("p")
        axes[0].loglog(g.p, g.seconds, "o-", label=scheme)
        axes[1].plot(g.p, g.speedup * g.p.iloc[0], "o-", label=scheme)
        axes[2].plot(g.p, g.efficiency, "o-", label=scheme)
    ps = sorted(res.p.unique())
    axes[1].plot(ps, ps, "k--", alpha=0.4, label="ideal")
    axes[0].set(xlabel="devices", ylabel="wall time [s]", title="time")
    axes[1].set(xlabel="devices", ylabel="speedup", title="speedup")
    axes[2].set(xlabel="devices", ylabel="efficiency", title="efficiency")
    for ax in axes:
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=7)
    fig.tight_layout()
    out_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_dir / "scalability.png", dpi=130)
    plt.close(fig)


def main():
    paths = sys.argv[1:] or ["scalability-results-8.csv"]
    out_dir = Path("analysis-out")
    best = load(paths)
    res = analyze(best)
    print(res.to_string(index=False))
    out_dir.mkdir(parents=True, exist_ok=True)
    res.to_csv(out_dir / "scalability-summary.csv", index=False)
    plots(res, out_dir)
    print(f"Figure + summary in {out_dir}/")


if __name__ == "__main__":
    main()
