#!/usr/bin/env python3
"""On-chip Pallas regression gate.

Runs the compiled (Mosaic, interpret=False) Pallas engines on a REAL TPU
and pins their trajectories against the XLA roll/stencil engines at small
sizes. This is the repeatable artifact-producing equivalent of the
reference's de-facto regression suite (its 490-run convergence sweep,
/root/reference/scripts/convergence_sweep.py) for tpuwave's *production
engine* on its *production platform*: the interpret-mode pytest suite
(tests/test_pallas.py) proves kernel semantics on CPU; this gate proves
the Mosaic-compiled binaries agree on the chip.

Checks (all f32 on chip; tolerances sized for f32 kernel-order noise):
  1. leapfrog pallas k=1          vs XLA roll scan
  2. leapfrog multistep k=32      vs XLA roll scan
  3. implicit Newmark CG (fused constrained apply)  vs XLA roll CG
  4. implicit Newmark Chebyshev (fused cheby block) vs XLA roll CG
  5. P2 canvas fused constrained apply              vs XLA canvas path
  6. varcoef FWI forward + reversal-adjoint grad    vs XLA stencil engine

Writes ``analysis/data/tpu-smoke.json`` (committed): per-check max error,
tolerance, pass/fail, plus platform/device metadata. Exit 0 iff all pass.
Run from the repo root with the axon TPU visible (no JAX_PLATFORMS
override); refuses to certify a CPU run unless --allow-cpu is given
(useful for exercising the harness itself).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARTIFACT = REPO / "analysis" / "data" / "tpu-smoke.json"

# Flipped to True by --allow-cpu on a CPU backend: Mosaic kernels cannot
# execute on XLA:CPU, so the harness itself is exercised in interpret
# mode there; the artifact records interpret_mode so a CPU run can never
# be mistaken for chip certification.
INTERPRET = False


def u0(xs, ys):
    return jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys)


def _maxerr(got, want):
    g, w = np.asarray(got, np.float64), np.asarray(want, np.float64)
    if g.shape != w.shape:
        # engines may pad differently (e.g. the compiled P2 canvas pads
        # columns to 128 Mosaic lanes, the XLA canvas does not): compare
        # on the common crop, which covers all true content
        crop = tuple(slice(0, min(a, b)) for a, b in zip(g.shape, w.shape))
        g, w = g[crop], w[crop]
    denom = max(1e-30, float(np.max(np.abs(w))))
    return float(np.max(np.abs(g - w))) / denom


def check_leapfrog_k1():
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((127, 127), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                       beta=0.0, dtype=jnp.float32)
    lf = s.initial_leapfrog_state(u0)
    want = s.run_leapfrog_scan(lf, 32)
    got = s.run_leapfrog_pallas(lf, 32, block_rows=32, interpret=INTERPRET)
    return max(_maxerr(got.u, want.u), _maxerr(got.u_prev, want.u_prev))


def check_leapfrog_k32():
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((255, 255), ((0.0, 0.0), (1.0, 1.0)), 5e-4,
                       beta=0.0, dtype=jnp.float32)
    lf = s.initial_leapfrog_state(u0)
    want = s.run_leapfrog_scan(lf, 64)
    got = s.run_leapfrog_multistep(lf, 64, steps_per_call=32, block_rows=64,
                                   double_buffer=True, interpret=INTERPRET)
    return max(_maxerr(got.u, want.u), _maxerr(got.u_prev, want.u_prev))


def check_implicit_cg():
    from tpuwave.models.fast import FastWaveSolver
    kw = dict(scheme="newmark", beta=0.25, gamma=0.5, lumped=False,
              dtype=jnp.float32)
    s = FastWaveSolver((96, 96), ((0.0, 0.0), (1.0, 1.0)), 0.005, **kw)
    st = s.initial_state(u0)
    want = s.run_scan(st, 8)
    got = s.run_implicit_pallas(st, 8, block_rows=32, interpret=INTERPRET)
    return _maxerr(got.u, want.u)


def check_implicit_cheby():
    from tpuwave.models.fast import FastWaveSolver
    kw = dict(scheme="newmark", beta=0.25, gamma=0.5, lumped=False,
              dtype=jnp.float32)
    s = FastWaveSolver((96, 96), ((0.0, 0.0), (1.0, 1.0)), 0.005, **kw)
    st = s.initial_state(u0)
    want = s.run_scan(st, 8)
    got = s.run_implicit_cheby(st, 8, degree=6, block_rows=32,
                               interpret=INTERPRET)
    return _maxerr(got.u, want.u)


def check_p2_canvas():
    from tpuwave.models.fast_p2 import P2CanvasSolver
    kw = dict(dtype=jnp.float32, row_multiple=8)
    a = P2CanvasSolver((24, 20), ((0.0, 0.0), (1.0, 1.0)), 0.004, **kw)
    b = P2CanvasSolver((24, 20), ((0.0, 0.0), (1.0, 1.0)), 0.004,
                       use_pallas=True, pallas_block_rows=8,
                       pallas_interpret=INTERPRET, **kw)
    sa, sb = a.initial_state(u0), b.initial_state(u0)
    err = _maxerr(sb.a, sa.a)
    for _ in range(4):
        sa, sb = a.step(sa), b.step(sb)
    return max(err, _maxerr(sb.u, sa.u))


def check_fwi_fwd_adjoint():
    from tpuwave.models.inverse import FwiProblem

    def prob(engine):
        # receivers inside the arrival cone (c~1.14, T=0.192) so the traces
        # carry real signal -- far receivers compare f32 noise against noise
        return FwiProblem((48, 40), ((0.0, 0.0), (1.0, 1.0)), 2e-3, 96,
                          source=(0.45, 0.55),
                          receivers=[(0.4, 0.45), (0.55, 0.62)],
                          dtype=jnp.float32, engine=engine,
                          adjoint="reversal", pallas_block_rows=16,
                          pallas_steps_per_call=8,
                          pallas_interpret=INTERPRET)

    ref, pal = prob("stencil"), prob("pallas")
    rng = np.random.default_rng(0)
    c2_true = jnp.asarray(1.0 + 0.3 * rng.random(ref.n_cells),
                          dtype=jnp.float32)
    obs = ref.simulate(c2_true)
    err_fwd = _maxerr(pal.simulate(c2_true), obs)
    c2_init = jnp.ones(ref.n_cells, jnp.float32)
    v_ref, g_ref = jax.value_and_grad(ref.misfit)(c2_init, obs)
    v_pal, g_pal = jax.value_and_grad(pal.misfit)(c2_init, obs)
    err_val = abs(float(v_pal) - float(v_ref)) / max(1e-30, abs(float(v_ref)))
    return max(err_fwd, err_val, _maxerr(g_pal, g_ref))


def check_mg_pallas_newmark():
    """PallasGmg fine level + the fused newmark_rhs_r0 / newmark_update
    solve-setup kernels (run_implicit_mg_pallas, Newmark-AA)."""
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((96, 96), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                       scheme="newmark", beta=0.25, gamma=0.5,
                       lumped=False, dtype=jnp.float32)
    st = s.initial_state(u0)
    want = s.run_implicit_mg(st, 8)
    got = s.run_implicit_mg_pallas(st, 8, block_rows=16,
                                   interpret=INTERPRET)
    return _maxerr(got.u, want.u)


def check_mg_pallas_theta():
    """theta_r0u / theta_r0v fused setup kernels + PallasGmg on the
    theta family (run_implicit_mg_pallas, CN)."""
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((96, 96), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                       scheme="theta", theta=0.5, lumped=False,
                       dtype=jnp.float32)
    st = s.initial_state(u0)
    want = s.run_implicit_mg(st, 8)
    got = s.run_implicit_mg_pallas(st, 8, block_rows=16,
                                   interpret=INTERPRET)
    return _maxerr(got.u, want.u)


def check_implicit_2term():
    """recurrence_r0 fused setup + constrained apply + PallasGmg on the
    displacement-form path (run_implicit_mg_2term)."""
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((96, 96), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                       scheme="newmark", beta=0.25, gamma=0.5,
                       lumped=False, dtype=jnp.float32)
    st = s.initial_state_consistent(u0)
    pair = s.implicit_2term_init(st)
    want = s.run_implicit_mg_2term(pair, 8, pallas=False)
    got = s.run_implicit_mg_2term(pair, 8, pallas=True, block_rows=16,
                                  interpret=INTERPRET)
    return max(_maxerr(got.u, want.u), _maxerr(got.u_prev, want.u_prev))


def check_fwi_ring_sponge():
    """Ring boundary-save multistep + damped (sponge) varcoef kernels:
    the fused reversal-adjoint storage flavour (ops/pallas_varcoef.py)."""
    from tpuwave.models.inverse import FwiProblem

    def prob(engine):
        return FwiProblem((48, 40), ((0.0, 0.0), (1.0, 1.0)), 2e-3, 96,
                          source=(0.45, 0.55),
                          receivers=[(0.4, 0.45), (0.55, 0.62)],
                          dtype=jnp.float32, engine=engine,
                          adjoint="reversal", sponge_width=0.15,
                          boundary_save="ring", pallas_block_rows=16,
                          pallas_steps_per_call=8,
                          pallas_interpret=INTERPRET)

    ref, pal = prob("stencil"), prob("pallas")
    rng = np.random.default_rng(1)
    c2_true = jnp.asarray(1.0 + 0.3 * rng.random(ref.n_cells),
                          dtype=jnp.float32)
    obs = ref.simulate(c2_true)
    err_fwd = _maxerr(pal.simulate(c2_true), obs)
    c2_init = jnp.ones(ref.n_cells, jnp.float32)
    v_ref, g_ref = jax.value_and_grad(ref.misfit)(c2_init, obs)
    v_pal, g_pal = jax.value_and_grad(pal.misfit)(c2_init, obs)
    err_val = abs(float(v_pal) - float(v_ref)) / max(1e-30, abs(float(v_ref)))
    return max(err_fwd, err_val, _maxerr(g_pal, g_ref))


def check_driven_multistep():
    """DRIVEN temporally-blocked leapfrog: per-substep boundary values
    injected inside the k-step kernel by global coordinates
    (leapfrog_multistep_driven_pallas) vs the XLA driven scan."""
    from tpuwave.models.fast import FastWaveSolver

    def g_fn(x, y, t):
        return 0.1 * jnp.sin(3.0 * t) * (1.0 + x * y)

    s = FastWaveSolver((255, 255), ((0.0, 0.0), (1.0, 1.0)), 5e-4,
                       beta=0.0, dtype=jnp.float32)
    lf = s.initial_leapfrog_state(u0, g_fn=g_fn)
    times = 5e-4 * (1.0 + np.arange(64))
    want = s.run_leapfrog_driven(lf, jnp.asarray(times, jnp.float32), g_fn)
    got = s.run_leapfrog_driven_multistep(lf, times, g_fn,
                                          steps_per_call=8, block_rows=64,
                                          interpret=INTERPRET)
    return max(_maxerr(got.u, want.u), _maxerr(got.u_prev, want.u_prev))


def check_tdep_leapfrog():
    """Time-dependent-C leapfrog (in-scan varcoef plane rebuild,
    models/fast.py::run_leapfrog_tdep). XLA path, certified ON CHIP: a
    time-constant c must reproduce the constant-stencil scan exactly up
    to f32 reassociation noise."""
    from tpuwave.models.fast import FastWaveSolver
    s = FastWaveSolver((127, 127), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                       beta=0.0, dtype=jnp.float32)
    lf = s.initial_leapfrog_state(u0)
    want = s.run_leapfrog_scan(lf, 32)

    def c_fn(xs, ys, t):
        return jnp.ones_like(xs)

    times = 1e-3 * (1.0 + jnp.arange(32, dtype=jnp.float32))
    got = s.run_leapfrog_tdep(lf, times, c_fn)
    return max(_maxerr(got.u, want.u), _maxerr(got.u_prev, want.u_prev))


CHECKS = [
    # (name, fn, relative tolerance)  -- f32 stencil trajectories accumulate
    # O(n_steps * eps) reassociation noise; tolerances sized accordingly
    ("leapfrog_pallas_k1", check_leapfrog_k1, 2e-5),
    ("leapfrog_multistep_k32", check_leapfrog_k32, 2e-4),
    ("leapfrog_driven_multistep_k8", check_driven_multistep, 2e-4),
    ("implicit_cg_constrained_apply", check_implicit_cg, 2e-3),
    ("implicit_chebyshev_block", check_implicit_cheby, 2e-3),
    ("mg_pallas_newmark_r0_update", check_mg_pallas_newmark, 2e-3),
    ("mg_pallas_theta_r0u_r0v", check_mg_pallas_theta, 2e-3),
    ("implicit_2term_recurrence_r0", check_implicit_2term, 2e-3),
    ("p2_canvas_constrained_apply", check_p2_canvas, 5e-4),
    ("fwi_varcoef_fwd_adjoint", check_fwi_fwd_adjoint, 5e-3),
    ("fwi_ring_sponge_multistep", check_fwi_ring_sponge, 5e-3),
    ("tdep_varcoef_leapfrog", check_tdep_leapfrog, 2e-5),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run (and write the artifact) on a CPU backend; "
                    "the artifact records platform=cpu so it cannot be "
                    "mistaken for chip certification")
    ap.add_argument("--only", help="comma-separated subset of check names")
    args = ap.parse_args(argv)

    dev = jax.devices()[0]
    platform = dev.platform
    if platform == "cpu":
        if not args.allow_cpu:
            print("tpu_smoke: no TPU visible (platform=cpu); pass "
                  "--allow-cpu to run the harness anyway", file=sys.stderr)
            return 2
        global INTERPRET
        INTERPRET = True  # Mosaic cannot execute on XLA:CPU

    selected = CHECKS
    if args.only:
        names = set(args.only.split(","))
        selected = [c for c in CHECKS if c[0] in names]

    # account the tunnel/backend warmup OUTSIDE the first check's seconds
    # (round-3 review: check 1 absorbed ~14 min of axon warmup, making
    # the per-check accounting unreadable)
    t0 = time.perf_counter()
    jax.block_until_ready(
        jnp.zeros((128, 128), jnp.float32) @ jnp.zeros((128, 128),
                                                       jnp.float32))
    warmup_s = round(time.perf_counter() - t0, 2)
    print(f"backend warmup: {warmup_s} s", flush=True)

    results = []
    for name, fn, tol in selected:
        t0 = time.perf_counter()
        try:
            err = fn()
            ok = bool(err <= tol)
            results.append({"check": name, "max_rel_err": err, "tol": tol,
                            "pass": ok,
                            "seconds": round(time.perf_counter() - t0, 2)})
            print(f"{'PASS' if ok else 'FAIL'} {name}: "
                  f"max_rel_err={err:.3e} tol={tol:.0e} "
                  f"({results[-1]['seconds']} s)", flush=True)
        except Exception as e:
            results.append({"check": name, "max_rel_err": None, "tol": tol,
                            "pass": False,
                            "error": f"{type(e).__name__}: {str(e)[:300]}",
                            "seconds": round(time.perf_counter() - t0, 2)})
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    all_pass = all(r["pass"] for r in results) and len(results) == len(CHECKS)
    artifact = {
        "platform": platform,
        "device": str(dev),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "interpret_mode": INTERPRET,
        "warmup_seconds": warmup_s,
        "all_pass": all_pass,
        "checks": results,
    }
    ARTIFACT.parent.mkdir(parents=True, exist_ok=True)
    ARTIFACT.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {ARTIFACT} (all_pass={all_pass})")
    return 0 if all_pass else 1


if __name__ == "__main__":
    sys.exit(main())
