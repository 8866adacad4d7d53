#!/usr/bin/env python3
"""Minimal reproducer hunt for the restrict+prolong TPU compile blowup.

  m0: prolong(restrict(b))                  pure shape round trip
  m1: prolong(restrict(mask(b)))            + iota masks
  m2: b + prolong(restrict(b))              + the bypass (diamond) edge
  m3: apply_stencil(prolong(restrict(b)))   + one stencil after
  m4: prolong(restrict(apply_c(b)))         + one masked stencil before
  m5: restrict(b) only
  m6: prolong(restrict8(b)) with restrict8 = subsample-only (no P^T pass)
  m7: dilate-only prolong (lax.pad interior=1, no stencil)

Usage: python -u scripts/diag_mg_minimal.py <nel> m0 m2 ...
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tpuwave.solve.multigrid as mg

NEL = int(sys.argv[1])
CASES = sys.argv[2:]

print(jax.devices(), flush=True)
b = jnp.zeros((NEL + 1, NEL + 1), jnp.float32)

S = ((0.0, 1.0, 1.0), (1.0, -6.0, 1.0), (1.0, 1.0, 0.0))


def mask(x):
    return jnp.where(mg._interior(x.shape), x, 0.0)


def apply_c(x):
    from tpuwave.ops.stencil import apply_stencil
    return mask(apply_stencil(mask(x), S))


def subsample(x):
    return x[::2, ::2]


def dilate(x):
    zero = jnp.asarray(0.0, x.dtype)
    return jax.lax.pad(x, zero, ((0, 0, 1), (0, 0, 1)))


FNS = {
    "m0": lambda x: mg.prolong_p1(mg.restrict_p1(x)),
    "m1": lambda x: mg.prolong_p1(mg.restrict_p1(mask(x))),
    "m2": lambda x: x + mg.prolong_p1(mg.restrict_p1(x)),
    "m3": lambda x: apply_c(mg.prolong_p1(mg.restrict_p1(x))),
    "m4": lambda x: mg.prolong_p1(mg.restrict_p1(apply_c(x))),
    "m5": lambda x: mg.restrict_p1(x),
    "m6": lambda x: mg.prolong_p1(subsample(x)),
    "m7": lambda x: dilate(mg.restrict_p1(x)),
}

for case in CASES:
    fn = FNS[case]
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(b)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{case} nel={NEL}: lower {t1 - t0:.1f} s, "
          f"compile {t2 - t1:.1f} s", flush=True)
