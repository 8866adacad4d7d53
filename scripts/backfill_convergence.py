#!/usr/bin/env python3
"""Backfill exactly the reference convergence rows missing from our dataset.

Reads the reference's published convergence CSV (analysis/data/
convergence-results.csv in /root/reference) and our merged dataset, computes
the (scheme, Nel, r, dt) combinations the reference ran that we have not,
and runs them through the same in-process harness the main sweep uses
(tpuwave.harness.run_case), cheapest first. Each completed row is appended
to our merged dataset CSV and the runlog IMMEDIATELY, so a long grind can be
interrupted and committed at any point.

Intended engines: the default backend (one TPU chip in this container — f64
is emulated but exact) or CPU with JAX_PLATFORMS=cpu.

Usage:
    python scripts/backfill_convergence.py [--limit N] [--max-steps N]
        [--dataset analysis/data/convergence-results.csv]
        [--reference /root/reference/analysis/data/convergence-results.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpuwave import config  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def scheme_of(row) -> str:
    """Map a reference CSV row to a harness scheme name."""
    if "theta" in row.get("method", ""):
        th = float(row["theta"])
        return f"theta-{th:.1f}"
    be = float(row["beta"])
    return f"newmark-{be:.2f}"


def key_of(row):
    return (scheme_of(row), int(row["N_el_x"]), int(row["r"]),
            float(row["dt"]))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", default="/root/reference/analysis/data/"
                                           "convergence-results.csv")
    ap.add_argument("--dataset",
                    default=str(REPO / "analysis/data/convergence-results.csv"))
    ap.add_argument("--runlog",
                    default=str(REPO / "analysis/data/convergence-runlog.csv"))
    ap.add_argument("--results-root", default="results")
    ap.add_argument("--base-params",
                    default=str(REPO / "parameters/standing-mode-wsol.json"))
    ap.add_argument("--T", type=float, default=1.0)
    ap.add_argument("--limit", type=int, default=0,
                    help="run at most N rows (0 = all)")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="skip rows needing more than N time steps (0 = all)")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    config.use_x64(not args.f32)

    from tpuwave.harness import PARAM_STEM, cfl_limit, run_case, SCHEME_DEFS

    ref_rows = list(csv.DictReader(open(args.reference)))
    our_rows = list(csv.DictReader(open(args.dataset)))
    have = {key_of(r) for r in our_rows}
    missing = [r for r in ref_rows if key_of(r) not in have]
    # cheapest first: cost ~ steps * DoF (DoF ~ (r*Nel)^2)
    missing.sort(key=lambda r: (float(r["T"]) / float(r["dt"]))
                 * (int(r["r"]) * int(r["N_el_x"])) ** 2)
    if args.max_steps:
        missing = [r for r in missing
                   if float(r["T"]) / float(r["dt"]) <= args.max_steps]
    if args.limit:
        missing = missing[:args.limit]
    print(f"{len(ref_rows)} reference rows, {len(our_rows)} ours, "
          f"{len(missing)} to backfill")

    results_base = Path(args.results_root)
    for row in missing:
        scheme, nel, r, dt = key_of(row)
        sdef = SCHEME_DEFS[scheme]
        steps = float(row["T"]) / dt
        print(f"[backfill] {scheme} Nel={nel} r={r} dt={dt} "
              f"({steps:.0f} steps)", flush=True)

        # fresh per-family convergence.csv so we pick up exactly this row
        fam_csv = results_base / f"{sdef['family']}-{PARAM_STEM}" / \
            "convergence.csv"
        if fam_csv.exists():
            fam_csv.unlink()

        overrides = {"Nel": str(nel), "R": str(r), "Dt": str(dt),
                     "T": row["T"], "Save Solution": False,
                     "Enable Logging": False, "Log Every": 0}
        code, elapsed, _ = run_case(scheme, args.base_params, overrides,
                                    results_root=args.results_root,
                                    timeout_s=args.timeout)
        print(f"  -> code={code} in {elapsed:.1f}s", flush=True)

        cfl = (cfl_limit(nel, r) if sdef["explicit"] else float("inf"))
        with open(args.runlog, "a") as lf:
            lf.write(f"{scheme},{nel},{r},{dt},{row['T']},{code},"
                     f"{elapsed:.3f},{cfl:.8f}\n")
        if code != 0 or not fam_csv.exists():
            continue
        new = fam_csv.read_text().splitlines()
        with open(args.dataset, "a") as out:
            for line in new[1:]:
                out.write(line + "\n")
    print("backfill done")


if __name__ == "__main__":
    sys.exit(main() or 0)
