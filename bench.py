#!/usr/bin/env python3
"""Headline benchmark: explicit Newmark (lumped mass) throughput.

Reproduces the reference's strong-scaling configuration at the BASELINE.md
north-star scale: standing-mode problem, P1 elements, IO disabled
(reference scripts/scalability_sweep.py:85-120), explicit central-difference
Newmark. Metric: DoF*steps/second. Baseline: the reference's best CPU
number, 1.14e7 DoF*steps/s (Newmark beta=0, 32 MPI ranks on 2x28-core Xeon,
BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DoF*steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_BASELINE = 1.14e7  # DoF*steps/s, reference p=32 explicit Newmark


def main():
    from tpuwave.models.fast import FastWaveSolver

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    nel = 4096 if on_accel else 512
    chunk = 50 if on_accel else 10
    repeats = 5 if on_accel else 3

    solver = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), 8e-5,
                            beta=0.0, dtype=jnp.float32)
    state = solver.initial_state(
        lambda xs, ys: jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))

    # warmup: compile + one chunk
    state = solver.run_scan(state, chunk)
    jax.block_until_ready(state)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = solver.run_scan(state, chunk)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)

    dof_steps = solver.n_dofs * chunk
    value = dof_steps / best
    print(json.dumps({
        "metric": (f"explicit Newmark (lumped) DoF*steps/s, {nel}x{nel} P1, "
                   f"f32, {platform}"),
        "value": value,
        "unit": "DoF*steps/s",
        "vs_baseline": value / REFERENCE_BASELINE,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
