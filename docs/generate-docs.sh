#!/usr/bin/env bash
# Generate API documentation (the counterpart of the reference's Doxygen
# setup, docs/generate-docs.sh + Doxyfile). Uses stdlib pydoc so no extra
# dependencies are needed; output is docs/api/*.html.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/docs/api"
mkdir -p "$OUT"
cd "$OUT"

export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export PYTHONPATH="$REPO"

modules=(
  tpuwave
  tpuwave.config
  tpuwave.harness
  tpuwave.utils.expr tpuwave.utils.params tpuwave.utils.naming
  tpuwave.utils.csvlog tpuwave.utils.vtu tpuwave.utils.checkpoint
  tpuwave.utils.profiling
  tpuwave.core.mesh tpuwave.core.quadrature tpuwave.core.shape
  tpuwave.ops.assembly tpuwave.ops.operators tpuwave.ops.stencil
  tpuwave.ops.pallas_kernels
  tpuwave.solve.cg
  tpuwave.models.discretization tpuwave.models.theta tpuwave.models.newmark
  tpuwave.models.fast tpuwave.models.runner
  tpuwave.parallel.sharding
  tpuwave.native
)
for m in "${modules[@]}"; do
  python -m pydoc -w "$m" || echo "WARN: pydoc failed for $m"
done
echo "API docs written to $OUT"
