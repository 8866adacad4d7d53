#!/usr/bin/env python3
"""f64 and compensated-f32 explicit throughput at the 4096^2 bench scale.

Round-2 verdict weak item: the f32 headline (bench.py) had no committed
f64 / compensated-f32 companion at the north-star size (f64 data existed
only at 640^2). This script measures, at the SAME 4096^2 standing-mode
leapfrog configuration:

  * f32 XLA roll scan          (the non-Pallas baseline)
  * compensated f32 (TwoSum carries, ~f48 effective; models/fast.py
    CompensatedState — 2 stencil applies + TwoSum bookkeeping per step)
  * f64 XLA roll scan          (emulated f64 on TPU)

The Pallas kernels are f32-only (Mosaic has no f64), so all three run the
XLA stencil path for an apples-to-apples comparison; bench.py's Pallas
numbers quantify the extra kernel speedup available to f32.

Usage (chip): python -u scripts/bench_precision.py [--nel 4096 --steps 64]
Copy the table into RESULTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def u0(xs, ys):
    return jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def time_path(label, run, state, n_dofs, steps, repeats=3):
    t0 = time.perf_counter()
    out = run(state)
    sync(out.u)
    print(f"# {label}: compile+first {time.perf_counter() - t0:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(out)
        sync(out.u)
        best = min(best, time.perf_counter() - t0)
    rate = n_dofs * steps / best
    print(f"{label}: {best / steps * 1e6:9.1f} us/step  "
          f"{rate:.3e} DoF*steps/s", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["f32", "comp", "f64"])
    args = ap.parse_args()

    from tpuwave.models.fast import FastWaveSolver

    nel, steps = args.nel, args.steps
    geo = ((0.0, 0.0), (1.0, 1.0))
    print(f"# platform={jax.devices()[0].platform} nel={nel} steps={steps}",
          flush=True)

    if "f32" not in args.skip:
        s32 = FastWaveSolver((nel, nel), geo, 8e-5, beta=0.0,
                             dtype=jnp.float32)
        lf = s32.initial_leapfrog_state(u0)
        time_path("f32  roll scan   ",
                  lambda st: s32.run_leapfrog_scan(st, steps), lf,
                  s32.n_dofs, steps)

    if "comp" not in args.skip:
        s32 = FastWaveSolver((nel, nel), geo, 8e-5, beta=0.0,
                             dtype=jnp.float32)
        cs = s32.initial_compensated_state(u0)
        time_path("f32c compensated ",
                  lambda st: s32.run_leapfrog_compensated(st, steps), cs,
                  s32.n_dofs, steps)

    if "f64" not in args.skip:
        from tpuwave import config
        config.use_x64(True)
        s64 = FastWaveSolver((nel, nel), geo, 8e-5, beta=0.0,
                             dtype=jnp.float64)
        lf = s64.initial_leapfrog_state(u0)
        time_path("f64  roll scan   ",
                  lambda st: s64.run_leapfrog_scan(st, steps), lf,
                  s64.n_dofs, steps)


if __name__ == "__main__":
    main()
