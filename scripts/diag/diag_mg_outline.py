#!/usr/bin/env python3
"""Can outlining the coarse branch into its own XLA computation cut the
V-cycle diamond's compile blowup?

Cases (2-level cycle, coarse = nel/2):
  base   — inline recursion (the production structure)
  cond   — coarse branch wrapped in lax.cond(pred, branch, zeros) with a
           runtime-true predicate: cond branches are separate HLO
           computations, so whole-graph passes see them in isolation
  scan1  — coarse branch wrapped in a length-1 lax.scan (same idea via
           the loop-body computation)
  remat  — coarse branch under jax.checkpoint (new jaxpr scope; tests
           whether scope alone matters without a separate computation)

Usage: python -u scripts/diag_mg_outline.py <nel> <case> [case ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tpuwave.solve.multigrid as mg
from tpuwave.solve.cheby_iter import chebyshev_block

NEL = int(sys.argv[1])
CASES = sys.argv[2:]
GEOM = ((0.0, 0.0), (1.0, 1.0))


class OutlineGmg(mg.GmgPreconditioner):
    mode = "base"

    def _coarse_branch(self, l, bc):
        return super(OutlineGmg, self)._cycle(l, bc)

    def _cycle(self, l, b):
        lev = self.levels[l]
        interior = mg._interior(lev.shape)
        apply_c = self._constrained(lev, interior)
        if l == len(self.levels) - 1:
            return self._coarse_solve(apply_c, b)
        x = jnp.zeros_like(b)
        x, r = chebyshev_block(apply_c, x, b, lev.sm_theta, lev.sm_coeffs)
        bc = mg.restrict_p1(jnp.where(interior, r, 0.0))
        bc = jnp.where(mg._interior(self.levels[l + 1].shape), bc, 0.0)
        nxt = l + 1
        if self.mode == "cond":
            pred = bc.size > 0  # runtime-constant True, traced as data? no:
            # python bool -> must be a traced pred to keep both branches;
            # use a data-dependent always-true predicate
            pred = jnp.isfinite(bc[0, 0])
            ec = jax.lax.cond(pred,
                              lambda y: self._coarse_branch(nxt, y),
                              lambda y: jnp.zeros_like(y), bc)
        elif self.mode == "scan1":
            def body(carry, _):
                return carry, self._coarse_branch(nxt, carry)
            _, ec = jax.lax.scan(body, bc, None, length=1)
            ec = ec[0]
        elif self.mode == "remat":
            ec = jax.checkpoint(
                lambda y: self._coarse_branch(nxt, y))(bc)
        else:
            ec = self._coarse_branch(nxt, bc)
        x = x + jnp.where(interior, mg.prolong_p1(ec), 0.0)
        r = b - apply_c(x)
        x, _ = chebyshev_block(apply_c, x, r, lev.sm_theta, lev.sm_coeffs)
        return x


def timed_compile(label, fn, arg):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(arg)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{label}: lower {t1 - t0:.1f} s, compile {t2 - t1:.1f} s",
          flush=True)


print(jax.devices(), flush=True)
b = jnp.zeros((NEL + 1, NEL + 1), jnp.float32)

for case in CASES:
    base = mg.gmg_for_system((NEL, NEL), GEOM, 1.0, 1e-6,
                             min_coarse=NEL // 2)
    p = OutlineGmg(base.levels, base.coarse_theta, base.coarse_coeffs)
    p.mode = case
    timed_compile(f"{case} 2-level nel={NEL}", p, b)
