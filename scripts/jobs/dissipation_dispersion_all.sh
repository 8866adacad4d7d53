#!/usr/bin/env bash
# Full dissipation/dispersion sweep (equivalent of the reference's
# scripts/dissipation_dispersion_all.pbs): Nel=60, r=1, T=5, 11 dt values
# per scheme, per-step logging; summary + time-series copied back.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/../.." && pwd)"
SCRATCH="${SCRATCH:-$(mktemp -d /tmp/tpuwave-dissdisp-XXXX)}"
OUT="${OUT:-$REPO/analysis/data}"
mkdir -p "$OUT"

cd "$SCRATCH"
echo "Running dissipation/dispersion sweep in $SCRATCH"
python "$REPO/scripts/dissipation_dispersion_sweep.py" "$@"

cp dissdisp-results*.csv dissdisp-runlog*.csv "$OUT"/ 2>/dev/null || true
for d in dissdisp-energy-series* dissdisp-error-series* dissdisp-probe-series*; do
  [ -d "$d" ] && cp -r "$d" "$OUT"/ || true
done
echo "Results copied to $OUT"
