#!/usr/bin/env python3
"""Generate the three analysis notebooks into analysis/.

Counterparts of the reference's convergence-analysis.ipynb,
scalability-analisys.ipynb and dissipation-dispersion-analysis.ipynb: the
notebooks drive the same computations as the analysis/*.py scripts (which
hold the logic) and render the figures inline.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "analysis"


def nb(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": text.splitlines(keepends=True)}


CONVERGENCE = nb([
    md("# Convergence analysis\n\n"
       "Order-of-accuracy verification from `convergence-results.csv` "
       "(produced by `scripts/convergence_sweep.py`). Expected orders: "
       "O(dt) for FE/BE, O(dt^2) for CN and both Newmark schemes; "
       "O(h^{r+1}) L2 / O(h^r) H1 in space."),
    code("import sys, pathlib\n"
         "sys.path.insert(0, str(pathlib.Path.cwd().parent))\n"
         "from analysis.convergence_analysis import (load, drop_unstable,\n"
         "                                           temporal_orders,\n"
         "                                           spatial_orders)\n"
         "df = load('data/convergence-results.csv')\n"
         "df.head()"),
    code("fit_df = drop_unstable(df)  # exclude instability-contaminated rows\n"
         "temporal_orders(fit_df)"),
    code("spatial_orders(fit_df)"),
    code("%matplotlib inline\n"
         "import matplotlib.pyplot as plt\n"
         "for r in sorted(df.r.unique()):\n"
         "    fig, axes = plt.subplots(1, 2, figsize=(11, 4))\n"
         "    for scheme, g in df[df.r == r].groupby('scheme'):\n"
         "        gt = g[g.N_el_x == g.N_el_x.max()].sort_values('dt')\n"
         "        axes[0].loglog(gt.dt, gt.rel_L2_error_final, 'o-', label=scheme)\n"
         "        gs = g[g.dt == g.dt.min()].sort_values('h')\n"
         "        axes[1].loglog(gs.h, gs.rel_L2_error_final, 's-', label=scheme)\n"
         "    axes[0].set(xlabel='dt', ylabel='rel L2', title=f'temporal, r={r}')\n"
         "    axes[1].set(xlabel='h', ylabel='rel L2', title=f'spatial, r={r}')\n"
         "    for ax in axes:\n"
         "        ax.grid(True, which='both', alpha=0.3); ax.legend(fontsize=7)\n"
         "    plt.show()"),
    md("## Collapsed error bound\n\n"
       "The total error behaves like C1 h^s + C2 dt^q; plotting err against "
       "the fitted bound collapses all runs onto the diagonal."),
    code("import numpy as np\n"
         "for scheme, g in df[df.r == 1].groupby('scheme'):\n"
         "    bound = g.h**2 + g.dt**2\n"
         "    plt.loglog(bound, g.rel_L2_error_final, '.', label=scheme, alpha=0.5)\n"
         "plt.xlabel('h^2 + dt^2'); plt.ylabel('rel L2'); plt.legend(fontsize=7)\n"
         "plt.grid(True, which='both', alpha=0.3); plt.show()"),
])

SCALABILITY = nb([
    md("# Strong-scaling analysis\n\n"
       "Wall time, speedup S(p)=T(1)/T(p) and efficiency E(p)=S(p)/p from "
       "`scalability-results-*.csv` (produced by "
       "`scripts/scalability_sweep.py`, min over repeats). Throughput in "
       "DoF*steps/s is comparable against BASELINE.md."),
    code("import sys, pathlib, glob\n"
         "sys.path.insert(0, str(pathlib.Path.cwd().parent))\n"
         "from analysis.scalability_analysis import load, analyze\n"
         "best = load(sorted(glob.glob('data/scalability-results-*.csv')))\n"
         "res = analyze(best)\nres"),
    code("%matplotlib inline\n"
         "import matplotlib.pyplot as plt\n"
         "fig, axes = plt.subplots(1, 3, figsize=(14, 4))\n"
         "for scheme, g in res.groupby('scheme'):\n"
         "    g = g.sort_values('p')\n"
         "    axes[0].loglog(g.p, g.seconds, 'o-', label=scheme)\n"
         "    axes[1].plot(g.p, g.speedup * g.p.iloc[0], 'o-', label=scheme)\n"
         "    axes[2].plot(g.p, g.efficiency, 'o-', label=scheme)\n"
         "ps = sorted(res.p.unique()); axes[1].plot(ps, ps, 'k--', alpha=0.4)\n"
         "for ax, t in zip(axes, ['time', 'speedup', 'efficiency']):\n"
         "    ax.set(xlabel='devices', title=t); ax.grid(alpha=0.3); ax.legend(fontsize=7)\n"
         "plt.show()"),
])

DISSDISP = nb([
    md("# Dissipation / dispersion analysis\n\n"
       "Discrete-energy behaviour E(t)/E(0) per scheme and dt, and the "
       "centre-probe signal against the exact standing-mode cosine "
       "(from `scripts/dissipation_dispersion_sweep.py` outputs)."),
    code("import pandas as pd\n"
         "df = pd.read_csv('data/dissdisp-results.csv')\n"
         "df.pivot_table(index='dt', columns='scheme', values='energy_ratio')"),
    code("%matplotlib inline\n"
         "import matplotlib.pyplot as plt, pathlib\n"
         "energy_dir = pathlib.Path('data/dissdisp-energy-series')\n"
         "schemes = sorted({f.name.split('_dt')[0] for f in energy_dir.glob('*.csv')})\n"
         "fig, axes = plt.subplots(1, len(schemes), figsize=(4*len(schemes), 3.5))\n"
         "for ax, scheme in zip(axes, schemes):\n"
         "    for f in sorted(energy_dir.glob(f'{scheme}_dt*.csv')):\n"
         "        s = pd.read_csv(f)\n"
         "        ax.plot(s.time, s.energy / s.energy.iloc[0],\n"
         "                label='dt=' + f.stem.split('_dt')[1], lw=0.9)\n"
         "    ax.set(title=scheme, xlabel='t', ylabel='E(t)/E(0)')\n"
         "    ax.grid(alpha=0.3); ax.legend(fontsize=6)\n"
         "plt.tight_layout(); plt.show()"),
    code("import numpy as np, math\n"
         "probe_dir = pathlib.Path('data/dissdisp-probe-series')\n"
         "fig, ax = plt.subplots(figsize=(10, 3.5))\n"
         "for f in sorted(probe_dir.glob('*.csv'))[:6]:\n"
         "    s = pd.read_csv(f)\n"
         "    ax.plot(s.time, s.u_probe, lw=0.8, label=f.stem)\n"
         "tt = np.linspace(0, 5, 1000)\n"
         "ax.plot(tt, np.cos(math.sqrt(2)*math.pi*tt), 'k--', alpha=0.5,\n"
         "        label='exact')\n"
         "ax.set(xlabel='t', ylabel='u(center)'); ax.grid(alpha=0.3)\n"
         "ax.legend(fontsize=6); plt.show()"),
])


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, notebook in (("convergence-analysis.ipynb", CONVERGENCE),
                           ("scalability-analysis.ipynb", SCALABILITY),
                           ("dissipation-dispersion-analysis.ipynb", DISSDISP)):
        path = OUT / name
        path.write_text(json.dumps(notebook, indent=1) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
