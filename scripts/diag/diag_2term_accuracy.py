#!/usr/bin/env python3
"""Ground-truth accuracy of the displacement-form (2-term) implicit path.

At fine meshes in f32 the K-apply cancels to h^2-scale values only a few
x above its own rounding noise, so trajectory DIFFS between solver paths
stop being meaningful — compare each path against the exact standing-mode
solution u = sin(pi x) sin(pi y) cos(sqrt(2) pi c t) instead. Also prints
the 2-term path's per-step CG iteration counts (the step must never run
0 iterations: that drops the physics term and the recurrence degenerates
to pure extrapolation).

TPU:    python -u scripts/diag_2term_accuracy.py --nel 4096 --steps 100
off-TPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u \
           scripts/diag_2term_accuracy.py --nel 256 --steps 50
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.models.fast import FastWaveSolver
from tpuwave.solve.cg import pcg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=4096)
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--schemes", nargs="+",
                   default=["newmark-0.25", "theta-0.5", "theta-1.0"])
    p.add_argument("--iter-steps", type=int, default=6,
                   help="how many leading steps to instrument for counts")
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (required off-TPU)")
    args = p.parse_args()
    print(jax.devices(), flush=True)
    geom = ((0.0, 0.0), (1.0, 1.0))
    om = np.sqrt(2.0) * np.pi

    def u0(x, y):
        return jnp.sin(np.pi * x) * jnp.sin(np.pi * y)

    for name in args.schemes:
        family, val = name.rsplit("-", 1)
        kw = ({"theta": float(val)} if family == "theta"
              else {"beta": float(val), "lumped": False})
        s = FastWaveSolver((args.nel, args.nel), geom, args.dt,
                           scheme=family, dtype=jnp.float32, **kw)
        xs, ys = s.grid_coords()
        phi = u0(xs, ys)
        n = args.steps
        uex = phi * np.cos(om * n * args.dt)
        den = float(jnp.linalg.norm(uex))
        dissipative = (family == "theta" and float(val) != 0.5)

        st = s.initial_state(u0)
        out3 = s.run_implicit_mg_pallas(st, n, interpret=args.interpret)
        e3 = float(jnp.linalg.norm(out3.u - uex)) / den
        lf = s.run_implicit_mg_2term(s.implicit_2term_init(st), n - 1,
                                     interpret=args.interpret)
        e2 = float(jnp.linalg.norm(lf.u - uex)) / den
        d32 = float(jnp.linalg.norm(lf.u - out3.u)) / den
        note = " (scheme dissipative: errors dominated by damping)" \
            if dissipative else ""
        print(f"{name} nel={args.nel} dt={args.dt} steps={n}: "
              f"rel err vs exact  3-array={e3:.3e}  2-term={e2:.3e}  "
              f"(paths differ by {d32:.3e}){note}", flush=True)

        # per-step iteration counts on the XLA 2-term step (host loop)
        if family == "newmark":
            c_u, c_up = s.gamma + 0.5, 0.5 - s.gamma
        else:
            c_u, c_up = 2.0 * s.theta, 1.0 - 2.0 * s.theta
        dt = s.dt
        precond = s.gmg_preconditioner()
        s_abs = (abs(c_u) + abs(c_up)) * dt * dt * sum(
            abs(cc) for row in s.stiff.stencil for cc in row)
        eps = float(jnp.finfo(s.dtype).eps)
        lf_it = s.implicit_2term_init(st)
        cu, cup = lf_it.u, lf_it.u_prev
        for k in range(args.iter_steps):
            combo = c_u * cu + c_up * cup
            r0 = jnp.where(s.interior, (-dt * dt) * s.stiff(combo), 0.0)
            x0 = jnp.where(s.interior, 2.0 * cu - cup, 0.0)
            nr0 = float(jnp.linalg.norm(r0))
            tol = min(eps * s_abs * float(jnp.linalg.norm(x0)), 0.5 * nr0)
            res = pcg(s._constrained(s.system), r0, jnp.zeros_like(r0),
                      r0=r0, precond_inv_diag=precond, abs_tol=tol,
                      max_iter=2000, reduction=s.cg_reduction)
            print(f"  step {k}: iters={int(res.iterations)} "
                  f"||r0||={nr0:.3e} tol={tol:.3e}", flush=True)
            cu, cup = x0 + res.x, cu


if __name__ == "__main__":
    main()
