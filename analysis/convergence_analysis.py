#!/usr/bin/env python3
"""Convergence analysis: order-of-accuracy fits and plots.

Script equivalent of the reference's analysis/convergence-analysis.ipynb:
loads convergence-results.csv, drops diverged rows (rel error > 1e5, the
notebook's filter), fits log-log slopes for

  * temporal order: error vs dt at the finest meshes (expect O(dt) for
    FE/BE, O(dt^2) for CN/Newmark)
  * spatial order: error vs h at the smallest dt (expect O(h^{r+1}) L2,
    O(h^r) H1)

and writes a summary table + per-scheme figures.

Usage: python analysis/convergence_analysis.py convergence-results.csv
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

DIVERGENCE_FILTER = 1e5  # notebook cell 2


def scheme_label(row) -> str:
    if row["theta"] != "N/A" and not pd.isna(row["theta"]):
        return f"theta-{float(row['theta']):g}"
    return f"newmark-{float(row['beta']):g}"


def load(path) -> pd.DataFrame:
    df = pd.read_csv(path, na_values=["N/A"])
    df["scheme"] = df.apply(
        lambda r: (f"theta-{r['theta']:g}" if not pd.isna(r["theta"])
                   else f"newmark-{r['beta']:g}"), axis=1)
    n0 = len(df)
    df = df[(df.rel_L2_error_final < DIVERGENCE_FILTER)
            & (df.rel_H1_error_final < DIVERGENCE_FILTER)]
    print(f"loaded {n0} rows, {len(df)} after divergence filter")
    return df.drop_duplicates(subset=["scheme", "N_el_x", "r", "dt"])


def drop_unstable(df: pd.DataFrame) -> pd.DataFrame:
    """Stricter filter for the order FITS (plots keep the notebook filter):
    a run with rel L2 > 10 has left the O(1)-norm solution entirely, and
    rel H1 > 100 means the derivative field is exponentially-amplified
    high-frequency noise even while L2 still looks O(1) (marginal FE rows)
    — same classification as scripts/compare_with_reference.py."""
    return df[(df.rel_L2_error_final < 10.0)
              & (df.rel_H1_error_final < 100.0)]


def fit_slope(x, y):
    x, y = np.log(np.asarray(x, float)), np.log(np.asarray(y, float))
    if len(x) < 2:
        return float("nan")
    return np.polyfit(x, y, 1)[0]


def _above_floor(g: pd.DataFrame, col: str, factor: float = 3.0):
    """Rows where ``col`` is dominated by the varying discretisation term.

    The total error behaves like C(h^s + dt^q) (the notebook's collapsed
    bound): sweeping one parameter with the other fixed, the error
    saturates at the fixed term's floor.  Fitting a log-log slope through
    saturated points biases the order towards zero, so keep only points a
    ``factor`` above the observed floor.
    """
    return g[g[col] >= factor * g[col].min()]


def temporal_orders(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for (scheme, r), gg in df.groupby(["scheme", "r"]):
        # finest mesh (lowest spatial floor) that still has >= 3 dt
        # points above the floor; coarser fallback keeps marginal
        # explicit schemes (few stable dts per mesh) fittable
        best = None
        for nel in sorted(gg.N_el_x.unique(), reverse=True):
            g = _above_floor(gg[gg.N_el_x == nel].sort_values("dt"),
                             "rel_L2_error_final")
            if len(g) >= 3:
                best = (nel, g)
                break
        if best is None:
            continue
        nel, g = best
        out.append({"scheme": scheme, "r": r, "Nel": nel,
                    "temporal_order_L2":
                        fit_slope(g.dt, g.rel_L2_error_final)})
    return pd.DataFrame(out)


def spatial_orders(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for (scheme, r), gg in df.groupby(["scheme", "r"]):
        dt = gg.dt.min()
        g = gg[gg.dt == dt].sort_values("h")
        gl2 = _above_floor(g, "rel_L2_error_final")
        gh1 = _above_floor(g, "rel_H1_error_final")
        if len(gl2) >= 2 and len(gh1) >= 2:
            out.append({"scheme": scheme, "r": r, "dt": dt,
                        "spatial_order_L2":
                            fit_slope(gl2.h, gl2.rel_L2_error_final),
                        "spatial_order_H1":
                            fit_slope(gh1.h, gh1.rel_H1_error_final)})
    return pd.DataFrame(out)


def plots(df: pd.DataFrame, out_dir: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir.mkdir(parents=True, exist_ok=True)
    for r in sorted(df.r.unique()):
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for scheme, g in df[df.r == r].groupby("scheme"):
            nel = g.N_el_x.max()
            gt = g[g.N_el_x == nel].sort_values("dt")
            axes[0].loglog(gt.dt, gt.rel_L2_error_final, "o-", label=scheme)
            dt = g.dt.min()
            gs = g[g.dt == dt].sort_values("h")
            axes[1].loglog(gs.h, gs.rel_L2_error_final, "s-", label=scheme)
        axes[0].set(xlabel="dt", ylabel="rel L2 error",
                    title=f"temporal, r={r} (finest mesh)")
        axes[1].set(xlabel="h", ylabel="rel L2 error",
                    title=f"spatial, r={r} (finest dt)")
        for ax in axes:
            ax.grid(True, which="both", alpha=0.3)
            ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(out_dir / f"convergence-r{r}.png", dpi=130)
        plt.close(fig)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "convergence-results.csv"
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("analysis-out")
    df = load(path)
    fit_df = drop_unstable(df)
    t = temporal_orders(fit_df)
    s = spatial_orders(fit_df)
    print("\nTemporal orders (coarse-dt fit at finest mesh):")
    print(t.to_string(index=False))
    print("\nSpatial orders (finest dt):")
    print(s.to_string(index=False))
    out_dir.mkdir(parents=True, exist_ok=True)
    t.to_csv(out_dir / "temporal-orders.csv", index=False)
    s.to_csv(out_dir / "spatial-orders.csv", index=False)
    plots(df, out_dir)
    print(f"\nFigures + tables in {out_dir}/")


if __name__ == "__main__":
    main()
