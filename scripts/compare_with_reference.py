#!/usr/bin/env python3
"""Compare tpuwave sweep outputs against the reference's published CSVs.

Usage:
    python scripts/compare_with_reference.py \
        analysis/data/dissdisp-results.csv \
        /root/reference/analysis/data/dissdisp-results.csv

Matches rows on (scheme, Nel, R, dt, T) and reports relative differences of
energy_ratio / final_rel_L2 / final_rel_H1 (dissdisp schema) or
rel_L2_error_final / rel_H1_error_final (convergence schema). Rows where
both codes diverge (energy ratio > 1e10 or non-finite errors) are counted
as matching blowups.
"""

from __future__ import annotations

import csv
import math
import sys


def key_of(row):
    for k in ("scheme", "method"):
        if k in row:
            scheme = row[k]
            break
    else:
        scheme = f"theta-{row.get('theta')}|{row.get('beta')}"
    nel = row.get("Nel") or row.get("N_el_x")
    return (scheme, nel, row.get("R", row.get("r")), row["dt"],
            row.get("T"), row.get("theta", ""), row.get("beta", ""))


def metrics_of(row):
    out = {}
    for name in ("energy_ratio", "final_rel_L2", "final_rel_H1",
                 "max_rel_L2", "rel_L2_error_final", "rel_H1_error_final"):
        if name in row and row[name] not in ("", "N/A"):
            try:
                out[name] = float(row[name])
            except ValueError:
                out[name] = float("nan")
    return out


def is_blowup(m):
    vals = list(m.values())
    if any((not math.isfinite(v)) or abs(v) > 1e10 for v in vals):
        return True
    # slow blowup: the wave equation conserves energy, so E(T)/E(0)
    # growing by more than an order of magnitude is an unstable run even
    # when the magnitudes are still modest (marginal FE at tiny dt);
    # trajectories there are chaotic in the last-digit rounding and the
    # two codes legitimately reach different magnitudes
    if m.get("energy_ratio", 0.0) > 10.0:
        return True
    # convergence schema: the exact-solution presets have O(1) norms, so a
    # relative error above 10 means the run left the solution entirely
    # (marginal explicit schemes in exponential growth).  Where it ends up
    # after ~1e4 chaotic doublings is roundoff-seeded; the reference's own
    # analysis notebook likewise drops these rows as diverged
    # (convergence-analysis.ipynb cell 2).
    if m.get("rel_L2_error_final", 0.0) > 10.0:
        return True
    # the H1 seminorm sees the exponentially-growing high-frequency
    # content first (each unstable mode contributes ~w_k * amplitude), so
    # a run can be orders of magnitude into blowup in H1 while its L2
    # error is still O(1).  No stable configuration in the 490-row sweep
    # exceeds rel H1 ~ 12; use a decade above that
    return m.get("rel_H1_error_final", 0.0) > 100.0


def main():
    ours_path, ref_path = sys.argv[1], sys.argv[2]
    ours = {key_of(r): metrics_of(r) for r in csv.DictReader(open(ours_path))}
    ref = {key_of(r): metrics_of(r) for r in csv.DictReader(open(ref_path))}
    common = sorted(set(ours) & set(ref))
    if not common:
        print("No common rows — check schemas/keys")
        return 1

    worst = 0.0
    n_exact = n_ok = n_blow = n_bad = 0
    for k in common:
        o, r = ours[k], ref[k]
        if is_blowup(r) or is_blowup(o):
            if is_blowup(r) == is_blowup(o):
                n_blow += 1
                # print the magnitudes so a slow blowup that is real in
                # one code and pathological in the other stays visible
                eo = o.get("energy_ratio")
                er = r.get("energy_ratio")
                mag = (f" (E-ratio ours={eo:.3g} ref={er:.3g})"
                       if eo is not None and er is not None else "")
                print(f"{k}: blowup in both (parity){mag}")
            else:
                n_bad += 1
                print(f"{k}: STABILITY MISMATCH ours={o} ref={r}")
            continue
        diffs = {name: abs(o[name] - r[name]) / max(abs(r[name]), 1e-300)
                 for name in o.keys() & r.keys()}
        # solver-noise floor: the reference's CG stops at 1e-6 relative
        # residual reduction, which contaminates its reported errors at the
        # ~1e-7 absolute level on fine meshes; differences below that floor
        # are algebraic noise in either code, not discretisation mismatches
        d = max((diffs[name] for name in diffs
                 if abs(o[name] - r[name]) > 1e-7), default=0.0)
        worst = max(worst, d)
        if max(diffs.values(), default=0.0) == 0.0:
            n_exact += 1
            print(f"{k}: EXACT (all printed digits)")
        elif d < 1e-3:
            n_ok += 1
            print(f"{k}: max reldiff {max(diffs.values()):.2e}"
                  + (" (below 1e-7 solver floor)" if d == 0.0 else ""))
        else:
            n_bad += 1
            print(f"{k}: LARGE DIFF {d:.2e}  ours={o}  ref={r}")

    print(f"\n{len(common)} common rows: {n_exact} exact, {n_ok} within 1e-3, "
          f"{n_blow} matching blowups, {n_bad} mismatches; "
          f"worst stable reldiff {worst:.2e}")
    return 0 if n_bad == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
