"""Time integrators: convergence orders, energy conservation, equivalences,
boundary conditions, forcing (MMS), stability — the reference's validation
methodology (SURVEY.md section 4) as fast pytest checks."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.params import load_params


def standing_mode(**over):
    base = {
        "Nel": "16", "R": "1", "T": "0.1", "Theta": "0.5", "Beta": "0.25",
        "Gamma": "0.5", "Dt": "0.01",
        "Save Solution": "false", "Log Every": "0",
        "C": {"Function expression": "1.0", "Variable names": "x, y, t"},
        "F": {"Function expression": "0.0", "Variable names": "x, y, t"},
        "U0": {"Function expression": "sin(pi*x)*sin(pi*y)",
               "Variable names": "x, y"},
        "V0": {"Function expression": "0.0", "Variable names": "x, y"},
        "G": {"Function expression": "0.0", "Variable names": "x, y, t"},
        "DGDT": {"Function expression": "0.0", "Variable names": "x, y, t"},
        "Solution": {"Function expression":
                     "cos(sqrt(2)*pi*t)*sin(pi*x)*sin(pi*y)",
                     "Variable names": "x, y, t"},
    }
    base.update(over)
    return base


def run_case(params_dict, scheme="theta", lumped=False):
    p = load_params(params_dict)
    d = Discretization(p)
    if scheme == "theta":
        s = ThetaSolver(d)
    else:
        s = NewmarkSolver(d, lumped_explicit=lumped)
    st = s.initial_state()
    t = 0.0
    info = None
    while t < p.t_final:
        t += p.dt
        st, info = s.step(st, t)
    return d, st, t, info


def rel_l2(d, st, t):
    return float(d.errors(st.u, t)[2])


# ---------------------------------------------------------------------------
# order-of-accuracy verification (reference convergence_sweep methodology)
# ---------------------------------------------------------------------------

def test_spatial_order_p1():
    errs = [rel_l2(*run_case(standing_mode(Nel=str(n), Dt="0.002", T="0.02"))[:3])
            for n in (8, 16, 32)]
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert all(o > 1.7 for o in orders), (errs, orders)


def test_spatial_order_p2():
    errs = [rel_l2(*run_case(standing_mode(Nel=str(n), R="2", Dt="0.001",
                                           T="0.01"))[:3])
            for n in (4, 8, 16)]
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert orders[0] > 2.5, (errs, orders)


def test_temporal_order_cn_and_be():
    cn = [rel_l2(*run_case(standing_mode(Nel="48", Dt=str(dt), T="0.48",
                                         Theta="0.5"))[:3])
          for dt in (0.08, 0.04, 0.02)]
    cn_order = math.log2(cn[0] / cn[2]) / 2
    assert 1.6 < cn_order < 3.2, cn
    be = [rel_l2(*run_case(standing_mode(Nel="48", Dt=str(dt), T="0.48",
                                         Theta="1.0"))[:3])
          for dt in (0.04, 0.02, 0.01)]
    be_order = math.log2(be[0] / be[2]) / 2
    assert 0.6 < be_order < 1.6, be


def test_temporal_order_newmark_aa():
    es = [rel_l2(*run_case(standing_mode(Nel="48", Dt=str(dt), T="0.48"),
                           scheme="newmark")[:3])
          for dt in (0.08, 0.04, 0.02)]
    order = math.log2(es[0] / es[2]) / 2
    assert 1.6 < order < 3.2, es


# ---------------------------------------------------------------------------
# structure preservation (reference dissipation/dispersion methodology)
# ---------------------------------------------------------------------------

def test_energy_conservation_cn():
    p = load_params(standing_mode(Nel="16", Dt="0.02", T="1.0", Theta="0.5"))
    d = Discretization(p)
    s = ThetaSolver(d)
    st = s.initial_state()
    e0 = float(d.energy(st.u, st.v))
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, _ = s.step(st, t)
    eT = float(d.energy(st.u, st.v))
    assert eT / e0 == pytest.approx(1.0, abs=2e-5)


def test_energy_decay_be():
    p = load_params(standing_mode(Nel="16", Dt="0.05", T="1.0", Theta="1.0"))
    d = Discretization(p)
    s = ThetaSolver(d)
    st = s.initial_state()
    e0 = float(d.energy(st.u, st.v))
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, _ = s.step(st, t)
    eT = float(d.energy(st.u, st.v))
    assert eT < 0.9 * e0  # backward Euler dissipates


def test_energy_conservation_newmark_aa():
    p = load_params(standing_mode(Nel="16", Dt="0.02", T="1.0"))
    d = Discretization(p)
    s = NewmarkSolver(d)
    st = s.initial_state()
    e0 = float(d.energy(st.u, st.v))
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, _ = s.step(st, t)
    eT = float(d.energy(st.u, st.v))
    assert eT / e0 == pytest.approx(1.0, abs=2e-5)


def test_cn_equals_newmark_aa():
    """Crank-Nicolson and Newmark(1/4, 1/2) are algebraically equivalent for
    the linear wave equation — the reference observes identical errors."""
    case = standing_mode(Nel="24", Dt="0.02", T="0.2")
    d1, st1, t1, _ = run_case(case, "theta")
    d2, st2, t2, _ = run_case(case, "newmark")
    e1, e2 = rel_l2(d1, st1, t1), rel_l2(d2, st2, t2)
    assert e1 == pytest.approx(e2, rel=1e-3)
    nu = float(jnp.linalg.norm(st1.u))
    assert float(jnp.linalg.norm(st1.u - st2.u)) < 1e-4 * nu


# ---------------------------------------------------------------------------
# explicit scheme: stability + lumped fast path
# ---------------------------------------------------------------------------

def test_explicit_newmark_stable_under_cfl():
    case = standing_mode(Nel="20", Dt="0.01", T="0.2", Beta="0.0")
    d, st, t, info = run_case(case, "newmark")
    assert float(info["norm_u"]) < 1e3
    assert rel_l2(d, st, t) < 0.05


def test_explicit_newmark_diverges_over_cfl():
    case = standing_mode(Nel="32", Dt="0.5", T="40.0", Beta="0.0")
    p = load_params(case)
    d = Discretization(p)
    s = NewmarkSolver(d)
    st = s.initial_state()
    t, diverged = 0.0, False
    while t < p.t_final:
        t += p.dt
        st, info = s.step(st, t)
        if d.check_divergence(float(info["norm_u"]), float(info["norm_v"])):
            diverged = True
            break
    assert diverged


def test_lumped_explicit_close_to_consistent():
    case = standing_mode(Nel="24", Dt="0.005", T="0.1", Beta="0.0")
    d1, st1, t1, _ = run_case(case, "newmark", lumped=False)
    d2, st2, t2, _ = run_case(case, "newmark", lumped=True)
    # both are valid discretisations; they agree to discretisation accuracy
    assert rel_l2(d1, st1, t1) < 0.03
    assert rel_l2(d2, st2, t2) < 0.03


# ---------------------------------------------------------------------------
# boundary conditions + forcing
# ---------------------------------------------------------------------------

def osc_boundary(**over):
    g = "if(x<0.1 && 0<=y && y<=1, sin(6*pi*t), 0.0)"
    dg = "if(x<0.1 && 0<=y && y<=1, cos(6*pi*t)*6*pi, 0.0)"
    base = standing_mode(
        U0={"Function expression": "0.0", "Variable names": "x, y"},
        G={"Function expression": g, "Variable names": "x, y, t"},
        DGDT={"Function expression": dg, "Variable names": "x, y, t"},
    )
    del base["Solution"]
    base.update(over)
    return base


@pytest.mark.parametrize("scheme", ["theta", "newmark"])
def test_time_dependent_dirichlet_imposed_exactly(scheme):
    case = osc_boundary(Nel="12", Dt="0.01", T="0.05")
    p = load_params(case)
    d = Discretization(p)
    s = ThetaSolver(d) if scheme == "theta" else NewmarkSolver(d)
    st = s.initial_state()
    t = 0.0
    for _ in range(5):
        t += p.dt
        st, _ = s.step(st, t)
    g_want = np.asarray(d.boundary_values(p.g, t))
    bnd = np.asarray(d.space.boundary_mask)
    u = np.asarray(st.u)
    if scheme == "theta":
        np.testing.assert_allclose(u[bnd], g_want[bnd], atol=1e-12)
    else:
        # Newmark imposes the BC through the acceleration; u|b tracks g(t)
        # to integrator accuracy rather than exactly
        np.testing.assert_allclose(u[bnd], g_want[bnd], atol=1e-3)
    # interior motion actually excited by the boundary forcing
    assert np.linalg.norm(u[~bnd]) > 1e-3


def test_forcing_mms_dumping_wave(parameters_dir):
    """Manufactured-solution check with nonzero forcing F (dumping-wave)."""
    p = load_params(parameters_dir / "dumping-wave.json",
                    overrides={"Nel": "16", "Dt": "0.005", "T": "0.05",
                               "Save Solution": "false", "Log Every": "0"})
    d = Discretization(p)
    s = ThetaSolver(d)
    st = s.initial_state()
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, _ = s.step(st, t)
    assert float(d.errors(st.u, t)[2]) < 0.05


def test_consistent_initial_acceleration():
    """M a0 = -K u0 => a0 ~ lap(u0) = -2 pi^2 u0 for the standing mode."""
    p = load_params(standing_mode(Nel="32"))
    d = Discretization(p)
    s = NewmarkSolver(d)
    st = s.initial_state()
    expected = -2 * math.pi ** 2 * np.asarray(st.u)
    got = np.asarray(st.a)
    inner = ~np.asarray(d.space.boundary_mask)
    denom = np.linalg.norm(expected[inner])
    assert np.linalg.norm(got[inner] - expected[inner]) / denom < 0.01
