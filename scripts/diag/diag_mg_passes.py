#!/usr/bin/env python3
"""Identify the TPU pass behind the V-cycle compile blowup by disabling
suspects via compiler_options (xla_disable_hlo_passes takes a comma list;
names not in the pipeline are ignored, so wrong guesses are harmless).

Usage: python -u scripts/diag_mg_passes.py <nel> <passlist|none> ...
e.g.   python -u scripts/diag_mg_passes.py 2048 \
           memory-space-assignment latency-hiding-scheduler none
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tpuwave.solve.multigrid as mg

NEL = int(sys.argv[1])
LISTS = sys.argv[2:]
GEOM = ((0.0, 0.0), (1.0, 1.0))

print(jax.devices(), flush=True)
b = jnp.zeros((NEL + 1, NEL + 1), jnp.float32)
p = mg.gmg_for_system((NEL, NEL), GEOM, 1.0, 1e-6, min_coarse=NEL // 2)

for passes in LISTS:
    opts = {} if passes == "none" else {"xla_disable_hlo_passes": passes}
    t0 = time.perf_counter()
    lowered = jax.jit(p).lower(b)
    t1 = time.perf_counter()
    try:
        lowered.compile(compiler_options=opts)
        t2 = time.perf_counter()
        print(f"disable=[{passes}] nel={NEL}: lower {t1 - t0:.1f} s, "
              f"compile {t2 - t1:.1f} s", flush=True)
    except Exception as e:
        print(f"disable=[{passes}] nel={NEL}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
