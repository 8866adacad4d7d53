"""Time-dependent wave speed c(x, y, t) — a tpuwave extension.

The reference evaluates C once at t = 0 (FunctionParser default time;
its WaveTheta.cpp:85-87 never calls c.set_time), so a t-dependent C is
silently frozen there. With ``"Time Dependent C": "true"`` tpuwave
re-evaluates c each step: K(t) is rebuilt inside the jitted step
(Discretization.stiffness_at), the theta scheme weights K^n / K^{n+1}
onto the explicit / implicit terms, and Newmark evaluates the elastic
force at t^{n+1}."""

import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.general import UnstructuredDiscretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode, run_case


def tdep_case(**over):
    """MMS: u = cos(t) sin(pi x) sin(pi y), c^2(t) = 1 + 0.5 sin(2t)
    => f = (2 pi^2 c^2(t) - 1) u."""
    base = standing_mode(
        **{"Time Dependent C": "true",
           "C": {"Function expression": "sqrt(1 + 0.5*sin(2*t))",
                 "Variable names": "x, y, t"},
           "F": {"Function expression":
                 "(2*pi^2*(1 + 0.5*sin(2*t)) - 1)*cos(t)*sin(pi*x)*sin(pi*y)",
                 "Variable names": "x, y, t"},
           "U0": {"Function expression": "sin(pi*x)*sin(pi*y)",
                  "Variable names": "x, y"},
           "V0": {"Function expression": "0.0", "Variable names": "x, y"},
           "Solution": {"Function expression":
                        "cos(t)*sin(pi*x)*sin(pi*y)",
                        "Variable names": "x, y, t"}})
    base.update(over)
    return base


# ---------------------------------------------------------------------------
# operator level
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("r", [1, 2])
def test_stiffness_at_matches_frozen_assembly(r):
    """K(t*) from the traceable path == host assembly with c frozen at t*."""
    live = standing_mode(Nel="5,4", R=str(r),
                         **{"C": {"Function expression": "1 + 0.5*x*sin(t)",
                                  "Variable names": "x, y, t"}})
    frozen = standing_mode(Nel="5,4", R=str(r),
                           **{"C": {"Function expression":
                                    "1 + 0.5*x*sin(0.7)",
                                    "Variable names": "x, y, t"}})
    d_live = Discretization(load_params(live))
    d_frozen = Discretization(load_params(frozen))
    k_t = d_live.stiffness_at(0.7)
    np.testing.assert_allclose(k_t.to_dense(), d_frozen.stiffness.to_dense(),
                               atol=1e-12)
    # and t = 0 reproduces the reference-semantics static operator
    k_0 = d_live.stiffness_at(0.0)
    np.testing.assert_allclose(k_0.to_dense(), d_live.stiffness.to_dense(),
                               atol=1e-12)


def test_stiffness_at_unstructured(tmp_path):
    from tests.test_unstructured import perturbed_mesh
    um = perturbed_mesh(5, seed=4)
    live = standing_mode(R="2",
                         **{"C": {"Function expression": "1 + 0.5*y*sin(t)",
                                  "Variable names": "x, y, t"}})
    frozen = standing_mode(R="2",
                           **{"C": {"Function expression":
                                    "1 + 0.5*y*sin(0.3)",
                                    "Variable names": "x, y, t"}})
    d_live = UnstructuredDiscretization(load_params(live), mesh=um)
    d_frozen = UnstructuredDiscretization(load_params(frozen), mesh=um)
    np.testing.assert_allclose(d_live.stiffness_at(0.3).to_dense(),
                               d_frozen.stiffness.to_dense(), atol=1e-12)


# ---------------------------------------------------------------------------
# scheme level
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["theta", "newmark"])
def test_static_c_unchanged_by_tdep_mode(scheme):
    """With a time-independent c, the time-dependent mode reproduces the
    static path (same operators, same trajectory to solver noise)."""
    base = standing_mode(T="0.05")
    d0, st0, t0, _ = run_case(base, scheme=scheme)
    dyn = dict(base, **{"Time Dependent C": "true"})
    d1, st1, t1, _ = run_case(dyn, scheme=scheme)
    np.testing.assert_allclose(np.asarray(st1.u), np.asarray(st0.u),
                               rtol=0, atol=1e-9)
    e0 = float(d0.errors(st0.u, t0)[2])
    e1 = float(d1.errors(st1.u, t1)[2])
    assert abs(e0 - e1) < 1e-8


def test_tdep_c_mms_accuracy_and_mode_matters():
    """The MMS with genuinely varying c(t): the time-dependent mode hits
    the spatial error floor; freezing c at t=0 (reference semantics) is
    an order of magnitude worse."""
    case = tdep_case(Nel="32", T="0.5", Dt="0.01")
    p = load_params(case)
    d = Discretization(p)
    s = ThetaSolver(d)
    assert s.time_dep_c
    st = s.initial_state()
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, _ = s.step(st, t)
    rel_l2 = float(d.errors(st.u, t)[2])
    assert rel_l2 < 5e-3, rel_l2

    frozen = dict(case, **{"Time Dependent C": "false"})
    d2, st2, t2, _ = run_case(frozen, scheme="theta")
    rel_l2_frozen = float(d2.errors(st2.u, t2)[2])
    assert rel_l2_frozen > 5 * rel_l2, (rel_l2, rel_l2_frozen)


def test_tdep_temporal_order_cn():
    """Self-convergence in dt on a fixed mesh: CN stays second order with
    the time-varying operator."""
    errs = []
    dts = [0.05, 0.025, 0.0125]
    ref_u = None
    case0 = tdep_case(Nel="16", T="0.5")
    for dt in [0.003125] + dts:
        p = load_params(dict(case0, Dt=str(dt)))
        d = Discretization(p)
        s = ThetaSolver(d)
        st = s.initial_state()
        t = 0.0
        while t < p.t_final - 1e-12:
            t += p.dt
            st, _ = s.step(st, t)
        u = np.asarray(st.u)
        if ref_u is None:
            ref_u = u
        else:
            errs.append(np.linalg.norm(u - ref_u))
    order = np.log(errs[0] / errs[2]) / np.log(dts[0] / dts[2])
    assert 1.8 < order < 2.3, (errs, order)


def test_tdep_newmark_matches_cn():
    """Newmark-AA and CN agree on the time-varying problem (both second
    order; equal up to the temporal error scale)."""
    case = tdep_case(Nel="16", T="0.25", Dt="0.005")
    d1, st1, t1, _ = run_case(case, scheme="theta")
    d2, st2, t2, _ = run_case(case, scheme="newmark")
    e1 = float(d1.errors(st1.u, t1)[2])
    e2 = float(d2.errors(st2.u, t2)[2])
    assert abs(e1 - e2) < 0.2 * max(e1, e2), (e1, e2)


def test_tdep_end_to_end_unstructured(tmp_path):
    from tpuwave import api
    from tpuwave.core.unstructured import write_msh
    from tpuwave.models.runner import RunConfig
    from tests.test_unstructured import perturbed_mesh
    um = perturbed_mesh(12, seed=9, amp=0.15)
    msh = write_msh(tmp_path / "p12.msh", um.vertex_coords, um.cells)
    case = tdep_case(T="0.1", Dt="0.01",
                     **{"Mesh File Name": str(msh),
                        "Save Solution": "false"})
    cfg = RunConfig(quiet=True, write_mesh=False,
                    results_root=str(tmp_path / "res"))
    r = api.solve(case, family="newmark", config=cfg)
    assert not r.diverged
    assert r.rel_l2 < 0.02


def test_mg_precond_frozen_hierarchy():
    """mg with `Time Dependent C`: the V-cycle hierarchy is frozen at the
    t=0 rms wave speed. A fixed SPD preconditioner is VALID for the
    per-step-varying SPD system (CG re-converges every solve; only
    iteration counts drift with |c(t) - c_ref|) — trajectories match the
    jacobi path to solver tolerance."""
    p = load_params(tdep_case(Dt="0.02", T="0.1"))
    for cls in (ThetaSolver, NewmarkSolver):
        d = Discretization(p)
        s_j = cls(d, precond="jacobi")
        s_m = cls(d, precond="mg")
        st_j, info_j = s_j.initial_state(), None
        st_m, info_m = s_m.initial_state(), None
        t = 0.0
        while t < p.t_final - 1e-12:
            t += p.dt
            st_j, info_j = s_j.step(st_j, t)
            st_m, info_m = s_m.step(st_m, t)
        nu = float(np.linalg.norm(np.asarray(st_j.u)))
        assert float(np.linalg.norm(np.asarray(st_j.u - st_m.u))) < 1e-8 * nu
        # the frozen V-cycle still converges the drifting system promptly
        assert int(info_m["iterations_1"]) <= int(info_j["iterations_1"]) + 5


def test_chebyshev_precond_matches_jacobi():
    """Per-step Gershgorin-bounded Chebyshev preconditioning changes only
    the CG convergence path, not the solution (same stopping contract)."""
    p = load_params(tdep_case(Dt="0.02", T="0.1"))
    for cls in (ThetaSolver, NewmarkSolver):
        d = Discretization(p)
        jac, che = cls(d, precond="jacobi"), cls(d, precond="chebyshev")
        sj, sc = jac.initial_state(), che.initial_state()
        t = 0.0
        for _ in range(3):
            t += p.dt
            sj, _ = jac.step(sj, t)
            sc, ic = che.step(sc, t)
        np.testing.assert_allclose(np.asarray(sc.u), np.asarray(sj.u),
                                   rtol=1e-8, atol=1e-10)


def test_carried_payload_matches_rebuild():
    """The K^n payload carried in ThetaState equals rebuilding K at t-dt
    (the pre-carry implementation) — trajectory bitwise-comparable."""
    p = load_params(tdep_case(Dt="0.02", T="0.1"))
    d = Discretization(p)
    solver = ThetaSolver(d)
    carried = solver.initial_state()
    bare = carried._replace(k_payload=None)  # forces the rebuild fallback
    t = 0.0
    for _ in range(3):
        t += p.dt
        carried, _ = solver.step(carried, t)
        bare_next, _ = solver.step(bare, t)
        bare = bare_next._replace(k_payload=None)
    np.testing.assert_allclose(np.asarray(carried.u), np.asarray(bare.u),
                               rtol=1e-14, atol=1e-15)
    np.testing.assert_allclose(np.asarray(carried.v), np.asarray(bare.v),
                               rtol=1e-14, atol=1e-15)


# ---------------------------------------------------------------------------
# fast-path (leapfrog, lumped-mass) time-dependent c
# ---------------------------------------------------------------------------

def _fast_tdep_error(nel, dt, T):
    """Relative vertex-L2 error of the fast tdep leapfrog on the MMS
    u = cos(t) sin(pi x) sin(pi y), c^2 = 1 + 0.5 sin(2t)."""
    import jax.numpy as jnp
    from tpuwave.models.fast import FastWaveSolver, LeapfrogState
    from tpuwave.ops.stencil import apply_varcoef_planes

    s = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), dt,
                       beta=0.0, dtype=jnp.float64)

    def c_fn(x, y, t):
        return jnp.sqrt(1.0 + 0.5 * jnp.sin(2.0 * t))

    def f_fn(x, y, t):
        c2 = 1.0 + 0.5 * jnp.sin(2.0 * t)
        return ((2.0 * jnp.pi ** 2 * c2 - 1.0) * jnp.cos(t)
                * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y))

    xs, ys = s.grid_coords()
    u0 = jnp.where(s.boundary, 0.0,
                   jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))
    # consistent first step: u^1 = u0 + dt v0 + dt^2/2 a0, a0 from K(0), f(0)
    ku0 = apply_varcoef_planes(s._tdep_planes(c_fn, 0.0), u0)
    a0 = -ku0 * s.inv_lumped + f_fn(xs, ys, 0.0)
    u1 = jnp.where(s.boundary, 0.0, u0 + 0.5 * dt * dt * a0)
    st = LeapfrogState(u=u1, u_prev=u0)

    n = int(round(T / dt))
    times = dt * (1.0 + jnp.arange(n - 1))
    st = s.run_leapfrog_tdep(st, times, c_fn, f_fn=f_fn)
    t_end = n * dt
    uex = jnp.where(s.boundary, 0.0, jnp.cos(t_end)
                    * jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))
    return float(jnp.linalg.norm(st.u - uex) / jnp.linalg.norm(uex))


def test_fast_tdep_constant_c_matches_constant_stencil():
    """c_fn == const: the in-scan varcoef planes reproduce the constant
    class stencil path (same element sums, different assembly order)."""
    import jax.numpy as jnp
    from tpuwave.models.fast import FastWaveSolver

    s = FastWaveSolver((24, 24), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                       beta=0.0, dtype=jnp.float64)
    lf = s.initial_leapfrog_state(
        lambda xs, ys: jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))
    want = s.run_leapfrog_scan(lf, 10)
    times = s.dt * (1.0 + jnp.arange(10))
    got = s.run_leapfrog_tdep(lf, times, lambda x, y, t: 1.0)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-12, atol=1e-14)


def test_fast_tdep_two_scans_no_tracer_leak():
    """Calling run_leapfrog_tdep twice on one solver must not leak the
    first scan's tracers through the _tdep_data cache (regression: the
    cache must hold numpy, not traced jnp arrays)."""
    import jax.numpy as jnp
    from tpuwave.models.fast import FastWaveSolver

    s = FastWaveSolver((16, 16), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                       beta=0.0, dtype=jnp.float64)
    lf = s.initial_leapfrog_state(
        lambda xs, ys: jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))
    times = s.dt * (1.0 + jnp.arange(4))
    c_fn = lambda x, y, t: 1.0 + 0.1 * jnp.sin(t) * x
    out = s.run_leapfrog_tdep(lf, times, c_fn)
    out = s.run_leapfrog_tdep(out, times + 4 * s.dt, c_fn)  # second trace
    assert np.isfinite(np.asarray(out.u)).all()


def test_fast_tdep_mms_second_order():
    """The fast tdep path converges at second order on the varying-c MMS
    (the production counterpart of the parity engines' Time Dependent C)."""
    e1 = _fast_tdep_error(nel=24, dt=0.01, T=0.4)
    e2 = _fast_tdep_error(nel=48, dt=0.005, T=0.4)
    assert e1 < 5e-3, e1
    assert e1 / e2 > 2.5, (e1, e2)  # O(dt^2 + h^2): ratio ~4


@pytest.mark.parametrize("engine", ["none", "cells", "dofs"])
@pytest.mark.parametrize("family", ["theta", "newmark"])
def test_tdep_unstructured_engines_match(engine, family, tmp_path):
    """Time Dependent C on the unstructured engines: the sharded variants
    (cells / dofs over the 8-device mesh) match the single-device
    trajectory; also covers theta's payload carry on unstructured (the
    payload API lives on UnstructuredDiscretization too)."""
    from tests.test_unstructured import perturbed_mesh
    from tpuwave.parallel.sharding import device_mesh

    um = perturbed_mesh(9, seed=5, amp=0.15)
    p = load_params(tdep_case(Dt="0.02", T="0.1"))
    ref = UnstructuredDiscretization(p, mesh=um)
    if engine == "none":
        d = UnstructuredDiscretization(p, mesh=um)
    else:
        d = UnstructuredDiscretization(p, mesh=um,
                                       device_mesh=device_mesh(8),
                                       dof_sharded=engine == "dofs")
    cls = ThetaSolver if family == "theta" else NewmarkSolver
    sref, s = cls(ref), cls(d)
    st_r, st = sref.initial_state(), s.initial_state()
    t = 0.0
    for _ in range(3):
        t += p.dt
        st_r, _ = sref.step(st_r, t)
        st, _ = s.step(st, t)
    u = st.u if d.dof_plan is None else d.dof_plan.from_banded(st.u)
    np.testing.assert_allclose(np.asarray(u), np.asarray(st_r.u),
                               rtol=1e-9, atol=1e-11)


def test_tdep_unstructured_chebyshev_sharded():
    """Per-step Gershgorin Chebyshev preconditioning works on the
    DoF-partitioned engine (abs_row_sums on the sharded operator)."""
    from tests.test_unstructured import perturbed_mesh
    from tpuwave.parallel.sharding import device_mesh

    um = perturbed_mesh(9, seed=5, amp=0.15)
    p = load_params(tdep_case(Dt="0.02", T="0.1"))
    d = UnstructuredDiscretization(p, mesh=um,
                                   device_mesh=device_mesh(8),
                                   dof_sharded=True)
    jac = NewmarkSolver(d, precond="jacobi")
    che = NewmarkSolver(d, precond="chebyshev")
    sj, sc = jac.initial_state(), che.initial_state()
    t = 0.0
    for _ in range(2):
        t += p.dt
        sj, _ = jac.step(sj, t)
        sc, _ = che.step(sc, t)
    np.testing.assert_allclose(np.asarray(sc.u), np.asarray(sj.u),
                               rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# fast P2: variable-coefficient block-stencil (round-3 tdep matrix closure)
# ---------------------------------------------------------------------------

def test_p2_varcoef_stencil_matches_parity_operator():
    """P2VarcoefStencil with c frozen at t* applies the SAME matrix as the
    parity P2 assembly (Discretization.stiffness_at) — column-by-column
    dense comparison on a tiny mesh."""
    import jax.numpy as jnp
    from tpuwave.models.fast_p2 import P2FastSolver

    case = standing_mode(Nel="4,3", R="2",
                         **{"C": {"Function expression": "1 + 0.4*x*sin(t) + 0.2*y",
                                  "Variable names": "x, y, t"},
                            "Time Dependent C": "true"})
    p = load_params(case)
    d = Discretization(p)
    s = P2FastSolver((4, 3), p.geometry, p.dt, scheme="newmark",
                     dtype=jnp.float64)
    k_fast = s._stiff_at(p.c.evaluate, 0.7)
    dense_ref = np.asarray(d.stiffness_at(0.7).to_dense())
    n = d.n_dofs
    cols = []
    for j in range(n):
        e = jnp.zeros(n, jnp.float64).at[j].set(1.0)
        cols.append(np.asarray(k_fast(e)))
    dense_fast = np.stack(cols, axis=1)
    np.testing.assert_allclose(dense_fast, dense_ref, rtol=1e-12,
                               atol=1e-13)
    # exact assembled diagonal too
    np.testing.assert_allclose(np.asarray(k_fast.diagonal()),
                               np.diag(dense_ref), rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("scheme", ["newmark", "theta"])
def test_p2_fast_tdep_matches_parity(scheme):
    """P2 fast tdep stepping == parity tdep engine to f64 CG tolerance on
    the homogeneous MMS case."""
    import jax.numpy as jnp
    from tpuwave.models.fast_p2 import P2FastSolver

    case = tdep_case(Nel="8", R="2", Dt="0.02", T="0.08",
                     F={"Function expression": "0.0",
                        "Variable names": "x, y, t"})
    case.pop("Solution")
    p = load_params(case)
    d = Discretization(p)
    ref = (NewmarkSolver if scheme == "newmark" else ThetaSolver)(d)
    st_r, t = ref.initial_state(), 0.0
    while t < p.t_final - 1e-12:
        t += p.dt
        st_r, _ = ref.step(st_r, t)

    s = P2FastSolver((8, 8), p.geometry, p.dt, scheme=scheme,
                     beta=p.beta, gamma=p.gamma, theta=p.theta,
                     dtype=jnp.float64)
    u0 = p.u0
    st = s.initial_state_tdep(
        lambda xs, ys: u0.evaluate(xs, ys, 0.0), p.c.evaluate)
    times = []
    t = 0.0
    while t < p.t_final - 1e-12:
        t += p.dt
        times.append(t)
    st = s.run_scan_tdep(st, times, p.c.evaluate)
    nu = float(np.linalg.norm(np.asarray(st_r.u)))
    assert float(np.linalg.norm(np.asarray(st.u - st_r.u))) < 1e-9 * nu
