#!/usr/bin/env python3
"""Benchmark the large-dt implicit MG-PCG fast paths (XLA vs Pallas-fused).

The regime where multigrid pays: dt far above the explicit CFL limit, so
single-level solvers need O(dt/h) iterations (docs/ROADMAP.md). Compares
``FastWaveSolver.run_implicit_mg`` (XLA roll stencils) against
``run_implicit_mg_pallas`` (fine level + CG matvecs + solve setup fused
into Pallas halo-DMA passes) on the same trajectory and reports ms/step
and the relative end-state difference.

Run on the TPU (default platform) for real numbers; off-TPU pass
--interpret (and e.g. --nel 64 --steps 3 --block-rows 16) for a
correctness smoke.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Implicit MG fast-path bench")
    p.add_argument("--nel", type=int, default=4096)
    p.add_argument("--dt", type=float, default=1e-3,
                   help="time step (default: CFL-breaking at 4096^2)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    p.add_argument("--schemes", nargs="+",
                   default=["theta-1.0", "theta-0.5", "newmark-0.25"])
    p.add_argument("--interpret", action="store_true",
                   help="run the Pallas kernels in interpret mode "
                        "(required off-TPU; correctness smoke, not perf)")
    p.add_argument("--block-rows", type=int, default=128)
    return p.parse_args()


def main():
    args = parse_args()
    from tpuwave.models.fast import FastWaveSolver

    print(jax.devices())
    geom = ((0.0, 0.0), (1.0, 1.0))
    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64

    def u0(x, y):
        return jnp.sin(np.pi * x) * jnp.sin(np.pi * y)

    def measure(label, fn, state, n, repeats):
        # progress markers: tunnel compiles at 4096^2 can take many
        # minutes, so say what we are waiting on
        print(f"  [{label}] compiling + warm run ...", flush=True)
        t0 = time.perf_counter()
        out = fn(state, n)          # compile + warm
        jax.block_until_ready(out)
        print(f"  [{label}] compile+warm {time.perf_counter() - t0:.1f} s",
              flush=True)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(state, n)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best, out

    for name in args.schemes:
        family, val = name.rsplit("-", 1)
        kw = ({"theta": float(val)} if family == "theta"
              else {"beta": float(val), "lumped": False})
        s = FastWaveSolver((args.nel, args.nel), geom, args.dt,
                           scheme=family, dtype=dtype, **kw)
        st = s.initial_state(u0)
        t_x, out_x = measure(f"{name} xla-mg", s.run_implicit_mg,
                             st, args.steps, args.repeats)
        t_p, out_p = measure(
            f"{name} pallas-mg",
            lambda st_, n_: s.run_implicit_mg_pallas(
                st_, n_, block_rows=args.block_rows,
                interpret=args.interpret),
            st, args.steps, args.repeats)
        rel = float(jnp.linalg.norm(out_x.u - out_p.u)
                    / jnp.linalg.norm(out_x.u))
        print(f"{name} nel={args.nel} dt={args.dt}: "
              f"XLA MG {t_x * 1e3:.2f} ms/step, "
              f"Pallas MG {t_p * 1e3:.2f} ms/step ({t_x / t_p:.2f}x), "
              f"rel diff {rel:.2e}")

        # displacement-form two-array path (one O(dt^2)-residual MG
        # solve per step, no mass/velocity solve; both families)
        lf0 = s.implicit_2term_init(st)

        def run2(lf_, n_):
            return s.run_implicit_mg_2term(
                lf_, n_, block_rows=args.block_rows,
                interpret=args.interpret)

        t_2, out_2 = measure(f"{name} 2term-mg", run2, lf0,
                             args.steps - 1, args.repeats)
        rel2 = float(jnp.linalg.norm(out_x.u - out_2.u)
                     / jnp.linalg.norm(out_x.u))
        print(f"{name} nel={args.nel} dt={args.dt}: "
              f"2term MG {t_2 * 1e3:.2f} ms/step "
              f"({t_p / t_2:.2f}x vs pallas-mg), rel diff {rel2:.2e}")


if __name__ == "__main__":
    main()
