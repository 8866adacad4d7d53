"""P2 (R = 2) fast engine on the product surface (models/fast_engine_p2.py).

Pins the round-4 contract: the reference's engine is degree-generic
(FE_SimplexP<dim>(r) at /root/reference/src/WaveEquationBase.cpp:74-84), so
R = 2 runs with driven time-dependent Dirichlet data, forcing, and
variable / time-dependent wave speed must reach a fast plane-stencil
engine through ``--engine auto|fast`` with trajectories matching the
parity engine to f64 solver tolerance (same derived acceleration BCs
WaveNewmark.cpp:177-262 and rhs assembly WaveTheta.cpp:119-186, on the
quadratic element).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.fast_engine import (fast_engine_ineligible_reason,
                                        make_fast_solver)
from tpuwave.models.fast_engine_p2 import (FastP2NewmarkSolver,
                                           FastP2ThetaSolver)
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode

DRIVEN = {
    "F": {"Function expression": "sin(3*pi*x)*cos(2*pi*y)*cos(5*t)",
          "Variable names": "x, y, t"},
    "G": {"Function expression": "0.1*sin(2*t)*(1+x*y)",
          "Variable names": "x, y, t"},
    "DGDT": {"Function expression": "0.2*cos(2*t)*(1+x*y)",
             "Variable names": "x, y, t"},
}

VARC = {"Function expression": "1.0 + 0.5*x + 0.25*y*y",
        "Variable names": "x, y, t"}


def driven_case(**over):
    case = standing_mode(Nel="8", R="2", **DRIVEN)
    case.pop("Solution")
    case.update(over)
    return case


def _run(solver, p):
    st = solver.initial_state()
    t, info = 0.0, None
    while t < p.t_final - 1e-12:
        t += p.dt
        st, info = solver.step(st, t)
    return st, info


def _uv(solver, st):
    """Flat (u, v) of a canvas-state P2 engine (round-5 layout: the
    product engine's state lives as (4, Hc, Wc) canvases)."""
    return solver.to_flat(st.u), solver.to_flat(st.v)


@pytest.mark.parametrize("fam,over", [
    ("theta", {"Theta": "0.5"}),
    ("theta", {"Theta": "1.0"}),
    ("newmark", {"Beta": "0.25"}),
    ("newmark", {"Beta": "0.0"}),
])
def test_p2_driven_forced_matches_parity(fam, over):
    """Driven g(t) + forcing at R=2: the P2 fast engine == parity engine
    to f64 CG tolerance with the SAME iteration counts (measured
    agreement ~1e-15)."""
    p = load_params(driven_case(**over))
    d = Discretization(p)
    if fam == "theta":
        ref, fast = ThetaSolver(d), FastP2ThetaSolver(d)
    else:
        ref, fast = NewmarkSolver(d), FastP2NewmarkSolver(d)
    st_r, info_r = _run(ref, p)
    st_f, info_f = _run(fast, p)
    uf, vf = _uv(fast, st_f)
    nu = float(jnp.linalg.norm(st_r.u))
    nv = float(jnp.linalg.norm(st_r.v))
    assert float(jnp.linalg.norm(st_r.u - uf)) < 1e-11 * nu
    assert float(jnp.linalg.norm(st_r.v - vf)) < 1e-11 * nv
    assert int(info_r["iterations_1"]) == int(info_f["iterations_1"])


@pytest.mark.parametrize("fam", ["theta", "newmark"])
def test_p2_varcoef_matches_parity(fam):
    """Spatially varying c at R=2 (P2VarcoefStencil): same element
    algebra as the parity assembly -> f64 agreement, same iterations."""
    p = load_params(driven_case(C=VARC))
    d = Discretization(p)
    if fam == "theta":
        ref, fast = ThetaSolver(d), FastP2ThetaSolver(d)
    else:
        ref, fast = NewmarkSolver(d), FastP2NewmarkSolver(d)
    st_r, info_r = _run(ref, p)
    st_f, info_f = _run(fast, p)
    assert float(jnp.linalg.norm(st_r.u - fast.to_flat(st_f.u))) \
        < 1e-11 * float(jnp.linalg.norm(st_r.u))
    assert int(info_r["iterations_1"]) == int(info_f["iterations_1"])


@pytest.mark.parametrize("fam", ["theta", "newmark"])
def test_p2_tdep_matches_parity(fam):
    """`Time Dependent C` at R=2: per-step P2VarcoefStencil rebuild
    inside the jitted step (theta carries the K(t^n) scale planes) —
    matches the parity per-step operator rebuild to f64 tolerance."""
    case = driven_case(**{"Time Dependent C": "true",
                          "C": {"Function expression":
                                "sqrt(1 + 0.5*sin(2*t))",
                                "Variable names": "x, y, t"}})
    p = load_params(case)
    d = Discretization(p)
    if fam == "theta":
        ref, fast = ThetaSolver(d), FastP2ThetaSolver(d)
    else:
        ref, fast = NewmarkSolver(d), FastP2NewmarkSolver(d)
    st_r, _ = _run(ref, p)
    st_f, _ = _run(fast, p)
    assert float(jnp.linalg.norm(st_r.u - fast.to_flat(st_f.u))) \
        < 1e-10 * float(jnp.linalg.norm(st_r.u))


def test_p2_scan_path_matches_per_step():
    """ScanMixin whole-loop scans (the runner's chunked fast path)
    reproduce the per-step trajectory on a driven R=2 problem.

    NB exact-bit equality held for the flat round-4 engine but not for
    the canvas layout: XLA fuses the multi-iteration scan body slightly
    differently from the standalone jitted step (CG reduction tiling),
    a measured 1-ulp (2.2e-16 abs) difference — single-iteration scans
    ARE bitwise identical. Pin the ulp class, not bits."""
    p = load_params(driven_case())
    d = Discretization(p)
    fast = FastP2ThetaSolver(d)
    st_steps, _ = _run(fast, p)
    times = []
    t = 0.0
    while t < p.t_final - 1e-12:
        t += p.dt
        times.append(t)
    st_scan, infos = fast.run_steps(fast.initial_state(), times)
    assert float(jnp.max(jnp.abs(st_steps.u - st_scan.u))) < 1e-14
    st_one = fast.initial_state()
    for tt in times:
        st_one, _ = fast.run_steps(st_one, [tt])
    assert float(jnp.max(jnp.abs(st_steps.u - st_one.u))) == 0.0
    assert infos["iterations_1"].shape == (len(times),)


def test_p2_grid_load_matches_parity_load_vector():
    """The P2 grid_load is the SAME r+1-rule quadrature assembly as the
    parity Discretization.load_vector (reference WaveTheta.cpp:164-172)
    — f64 roundoff agreement, not just accuracy class."""
    p = load_params(driven_case())
    d = Discretization(p)
    fast = FastP2ThetaSolver(d)
    for t in (0.0, 0.37, 1.42):
        L_ref = d.load_vector(t)
        L_fast = fast.to_flat(fast.grid_load(t))
        rel = float(jnp.linalg.norm(L_ref - L_fast)
                    / jnp.linalg.norm(L_ref))
        assert rel < 1e-13


def test_p2_mms_spatial_order():
    """MMS at R=2: the consistent P2 load + driven algebra keep the
    engine at the cubic L2 spatial order (slope ~3). u_ex =
    sin(3 pi x) sin(2 pi y) cos t -> f = (13 pi^2 - 1) u_ex."""
    mms = {
        "U0": {"Function expression": "sin(3*pi*x)*sin(2*pi*y)",
               "Variable names": "x, y"},
        "V0": {"Function expression": "0.0", "Variable names": "x, y"},
        "F": {"Function expression":
              "(13*pi^2 - 1)*sin(3*pi*x)*sin(2*pi*y)*cos(t)",
              "Variable names": "x, y, t"},
        "G": {"Function expression": "0.0", "Variable names": "x, y, t"},
        "DGDT": {"Function expression": "0.0", "Variable names": "x, y, t"},
        "Solution": {"Function expression":
                     "sin(3*pi*x)*sin(2*pi*y)*cos(t)",
                     "Variable names": "x, y, t"},
        "T": "0.02", "Dt": "0.0005", "Theta": "0.5", "R": "2",
    }
    errs = []
    for nel in (8, 16):
        p = load_params(standing_mode(**mms, Nel=str(nel)))
        d = Discretization(p)
        fast = FastP2ThetaSolver(d)
        st, _ = _run(fast, p)
        errs.append(float(d.errors(fast.to_flat(st.u), p.t_final)[2]))
    slope = np.log2(errs[0] / errs[1])
    assert 2.6 < slope < 3.4, (errs, slope)


def test_p2_eligibility_and_factory_routing():
    p = load_params(driven_case())
    assert fast_engine_ineligible_reason(p) is None
    assert fast_engine_ineligible_reason(Discretization(p)) is None
    s = make_fast_solver(p, "theta")
    assert isinstance(s, FastP2ThetaSolver)
    s = make_fast_solver(Discretization(p), "newmark")
    assert isinstance(s, FastP2NewmarkSolver)
    # R > 2 is rejected at the Params layer already (reference supports
    # only FE_SimplexP degrees 1/2)
    from tpuwave.utils.params import ParamError
    with pytest.raises(ParamError):
        load_params(driven_case(R="3"))


@pytest.mark.parametrize("prec", ["mg", "chebyshev"])
def test_p2_preconditioners_match_like_for_like(prec):
    """mg: (p+h)-V-cycle preconditioned CG matches the parity engine
    running the SAME preconditioner with identical iteration counts.
    chebyshev: different lambda-bound estimators (analytic Gershgorin vs
    power iteration) -> agreement at the solve-tolerance class."""
    case = driven_case(Beta="0.25", Dt="0.1", T="0.3")
    p = load_params(case)
    d = Discretization(p)
    fast = make_fast_solver(d, "newmark", precond=prec)
    st_f, info_f = _run(fast, p)
    uf = fast.to_flat(st_f.u)
    if prec == "mg":
        ref = NewmarkSolver(d, precond="mg")
        st_r, info_r = _run(ref, p)
        assert float(jnp.linalg.norm(st_r.u - uf)) \
            < 1e-11 * float(jnp.linalg.norm(st_r.u))
        assert int(info_r["iterations_1"]) == int(info_f["iterations_1"])
    else:
        ref = NewmarkSolver(d)
        st_r, _ = _run(ref, p)
        assert float(jnp.linalg.norm(st_r.u - uf)) \
            < 1e-5 * float(jnp.linalg.norm(st_r.u))


def test_p2_varcoef_mg_frozen_hierarchy():
    """Varcoef c + mg on the P2 engine: the hierarchy freezes at the rms
    wave speed (the parity engine cannot run mg here at all) — the
    trajectory still matches the parity jacobi engine at the
    solve-tolerance class."""
    p = load_params(driven_case(C=VARC, Dt="0.05", T="0.15"))
    d = Discretization(p)
    fast = make_fast_solver(d, "theta", precond="mg")
    ref = ThetaSolver(d)
    st_f, _ = _run(fast, p)
    st_r, _ = _run(ref, p)
    assert float(jnp.linalg.norm(st_r.u - fast.to_flat(st_f.u))) \
        < 1e-5 * float(jnp.linalg.norm(st_r.u))


def test_p2_params_built_engine_runs_and_matches():
    """make_fast_solver(Params, ...) (the bench-scale O(grid) product
    path via P2GridDiagnostics) gives the same trajectory and
    diagnostics as the Discretization-built engine."""
    p = load_params(driven_case(T="0.02"))
    d = Discretization(p)
    s_d = make_fast_solver(d, "newmark")
    s_p = make_fast_solver(p, "newmark")
    st_d, _ = _run(s_d, p)
    st_p, _ = _run(s_p, p)
    assert float(jnp.linalg.norm(st_d.u - st_p.u)) == 0.0
    e_d = float(s_d.disc.energy(st_d.u, st_d.v))
    e_p = float(s_p.disc.energy(st_p.u, st_p.v))
    assert abs(e_d - e_p) < 1e-12 * abs(e_d)


def test_p2_grid_diagnostics_matches_parity():
    """P2GridDiagnostics (O(grid) surface for Params-built P2 engines)
    reproduces the parity Discretization's energy / errors / probe /
    interpolate to f64 summation roundoff (non-square mesh, constant and
    varying c)."""
    from tpuwave.models.p2_diag import P2GridDiagnostics

    for c_expr in ("1.0", "1.0 + 0.5*x + 0.25*y*y"):
        case = standing_mode(Nel="7,5", R="2",
                             C={"Function expression": c_expr,
                                "Variable names": "x, y, t"})
        p = load_params(case)
        d = Discretization(p)
        g = P2GridDiagnostics(p)
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.standard_normal(d.n_dofs))
        v = jnp.asarray(rng.standard_normal(d.n_dofs))
        e_ref, e_grid = float(d.energy(u, v)), float(g.energy(u, v))
        assert abs(e_ref - e_grid) < 1e-12 * abs(e_ref)
        pr_ref, pr_grid = float(d.probe(u)), float(g.probe(u))
        assert abs(pr_ref - pr_grid) < 1e-13 * max(1.0, abs(pr_ref))
        er = [float(x) for x in d.errors(u, 0.3)]
        eg = [float(x) for x in g.errors(u, 0.3)]
        for a, b in zip(er, eg):
            assert abs(a - b) < 1e-11 * abs(a), (er, eg)
        iu_r = np.asarray(d.interpolate(p.u0))
        iu_g = np.asarray(g.interpolate(p.u0))
        np.testing.assert_allclose(iu_g, iu_r, rtol=0, atol=1e-14)


# ---------------------------------------------------------------------------
# CLI routing
# ---------------------------------------------------------------------------

def _write(tmp_path, case, name="case.json"):
    path = tmp_path / name
    path.write_text(json.dumps(case))
    return path


def _cli(main, path, tmp_path, root, extra=()):
    return main([str(path), "--results-root", str(tmp_path / root),
                 "--mesh-root", str(tmp_path / "mesh"), "--quiet", *extra])


def test_cli_r2_engine_fast_matches_parity(tmp_path):
    """`--engine fast` at R=2 produces the standard run folder with CSVs
    matching `--engine parity` digit-for-digit on a driven case (the
    round-3 VERDICT's top ask: auto no longer drops R=2 onto parity)."""
    from tpuwave.cli import theta as cli_theta
    case = driven_case(**{"Log Every": "1", "T": "0.05"})
    path = _write(tmp_path, case)
    assert _cli(cli_theta.main, path, tmp_path, "fast",
                ("--engine", "fast")) == 0
    assert _cli(cli_theta.main, path, tmp_path, "par",
                ("--engine", "parity")) == 0
    sub = "theta-case/run-R2-N8x8-dt0_01-T0_05-theta0_5"
    for csv in ("probe.csv", "energy.csv", "iterations.csv"):
        fa = (tmp_path / "fast" / sub / csv).read_text()
        pa = (tmp_path / "par" / sub / csv).read_text()
        assert fa == pa, csv


def test_cli_r2_auto_routes_to_fast(tmp_path, capsys):
    """--engine auto (the default) picks the fast engine for R=2."""
    from tpuwave.cli import newmark as cli_newmark
    path = _write(tmp_path, driven_case(T="0.02"))
    rc = cli_newmark.main([str(path), "--results-root",
                           str(tmp_path / "out"), "--mesh-root",
                           str(tmp_path / "mesh")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Engine: fast (grid-stencil)" in out


@pytest.mark.parametrize("preset", ["sine-membrane", "oscillating-boundary",
                                    "square-pulsing"])
def test_driven_presets_r2_fast_matches_parity(parameters_dir, preset):
    """The driven presets run at R=2 on the P2 fast engine with
    trajectories matching the parity engine (shortened T; reference
    anchor: its convergence dataset's R=2 rows)."""
    case = json.loads((parameters_dir / f"{preset}.json").read_text())
    case["R"] = "2"
    case["T"] = "0.06"
    case["Save Solution"] = "false"
    p = load_params(case)
    d = Discretization(p)
    ref, fast = ThetaSolver(d), FastP2ThetaSolver(d)
    st_r, _ = _run(ref, p)
    st_f, _ = _run(fast, p)
    nu = float(jnp.linalg.norm(st_r.u)) + 1e-30
    assert float(jnp.linalg.norm(st_r.u - fast.to_flat(st_f.u))) \
        < 1e-10 * nu, preset


def test_p2_newmark_nonzero_boundary_data_decays_like_parity():
    """g == 0 with initial data NONZERO on the boundary at R=2: the
    derived accel BC (g - z)/(beta dt^2) drives u|boundary toward g on
    vertex AND edge-midpoint planes (the round-3 review regression, now
    on the quadratic element)."""
    case = standing_mode(Nel="6", R="2", T="0.03", Dt="0.01", Beta="0.25",
                         U0={"Function expression": "1 + x*y",
                             "Variable names": "x, y"})
    case.pop("Solution")
    p = load_params(case)
    d = Discretization(p)
    ref, fast = NewmarkSolver(d), FastP2NewmarkSolver(d)
    st_r, _ = _run(ref, p)
    st_f, _ = _run(fast, p)
    uf = np.asarray(fast.to_flat(st_f.u))
    nu = float(jnp.linalg.norm(st_r.u))
    assert float(jnp.linalg.norm(st_r.u - jnp.asarray(uf))) < 1e-10 * nu
    bnd = np.asarray(d.boundary_mask)
    assert float(np.max(np.abs(uf[bnd]))) < 1e-5


@pytest.mark.parametrize("fam,prec", [("theta", "jacobi"),
                                      ("newmark", "mg"),
                                      ("theta", "chebyshev")])
def test_p2_canvas_solve_engine_matches_flat(fam, prec):
    """The fused canvas solve path of the P2 product engine (use_pallas:
    CG matvecs + mg smoothing through the Mosaic block-stencil kernel,
    XLA lift) reproduces the flat solve path with identical iteration
    counts on a driven + forced problem (interpret mode on CPU;
    Mosaic-compiled certification is the chip gate's p2 check)."""
    case = driven_case(**{"Nel": "12,21", "Beta": "0.25", "T": "0.03"})
    p = load_params(case)
    s_x = make_fast_solver(p, fam, precond=prec)
    s_c = make_fast_solver(p, fam, precond=prec, use_pallas=True,
                           pallas_block_rows=8, pallas_interpret=True)
    assert s_c._use_pallas
    st_x, info_x = _run(s_x, p)
    st_c, info_c = _run(s_c, p)
    ux, uc = s_x.to_flat(st_x.u), s_c.to_flat(st_c.u)
    nu = float(jnp.linalg.norm(ux))
    assert float(jnp.linalg.norm(ux - uc)) < 1e-11 * nu
    assert int(info_x["iterations_1"]) == int(info_c["iterations_1"])


# ---------------------------------------------------------------------------
# sharding (round-5 contract: --shard rows|blocks at R = 2 — the
# reference's engine is partition-generic at every degree,
# WaveEquationBase.cpp:65-69 with :74-84)
# ---------------------------------------------------------------------------

def test_p2_sharded_product_engine_matches_single_device():
    """Driven + forced + mg at R=2 on the 8-device virtual mesh: the
    canvas plane stack row-shards (uneven plane rows padded into the
    canvas) and reproduces the single-device trajectory."""
    import jax
    from tpuwave.parallel.sharding import device_mesh, grid_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = load_params(driven_case(**{"Nel": "9,7", "Beta": "0.25",
                                   "T": "0.03"}))
    sh = grid_sharding(device_mesh(8))
    s1 = make_fast_solver(p, "newmark", precond="mg")
    s8 = make_fast_solver(p, "newmark", precond="mg", sharding=sh)
    st1, i1 = _run(s1, p)
    st8, i8 = _run(s8, p)
    assert len(st8.u.sharding.device_set) == 8
    u1, u8 = s1.to_flat(st1.u), s8.to_flat(st8.u)
    nu = float(jnp.linalg.norm(u1))
    assert float(jnp.linalg.norm(u1 - u8)) < 1e-12 * nu
    assert int(i1["iterations_1"]) == int(i8["iterations_1"])
    # psum'd O(grid) diagnostics under the sharded layout
    e1 = float(s1.disc.energy(st1.u, st1.v))
    e8 = float(s8.disc.energy(st8.u, st8.v))
    assert abs(e1 - e8) < 1e-12 * abs(e1)


def test_p2_sharded_2d_blocks_matches_single_device():
    """2-D block sharding (rows x cols device mesh) at R=2: same
    trajectory as single-device — the stretch --shard blocks layout."""
    import jax
    from tpuwave.parallel.sharding import device_mesh, grid_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = load_params(driven_case(**{"Nel": "10,6", "T": "0.03"}))
    sh = grid_sharding(device_mesh(shape=(4, 2)))
    s1 = make_fast_solver(p, "theta")
    s8 = make_fast_solver(p, "theta", sharding=sh)
    st1, _ = _run(s1, p)
    st8, _ = _run(s8, p)
    assert len(st8.u.sharding.device_set) == 8
    u1, u8 = s1.to_flat(st1.u), s8.to_flat(st8.u)
    assert float(jnp.linalg.norm(u1 - u8)) \
        < 1e-12 * float(jnp.linalg.norm(u1))


def test_cli_shard_rows_csv_parity_r2(tmp_path, capsys):
    """`--shard rows` through the CLI at R=2: the partitioned run's CSVs
    match the unsharded run digit-for-digit (round-4 VERDICT top ask)."""
    import jax
    from tpuwave.cli import newmark as cli_newmark
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    case = driven_case(**{"Log Every": "1", "T": "0.05", "Beta": "0.25"})
    path = _write(tmp_path, case)
    assert _cli(cli_newmark.main, path, tmp_path, "one") == 0
    assert cli_newmark.main([str(path), "--results-root",
                             str(tmp_path / "sharded"), "--mesh-root",
                             str(tmp_path / "mesh"),
                             "--shard", "rows"]) == 0
    out = capsys.readouterr().out
    assert "Sharding: rows over" in out
    sub = "newmark-case/run-R2-N8x8-dt0_01-T0_05-gamma0_5-beta0_25"
    for csv in ("probe.csv", "energy.csv", "iterations.csv"):
        fa = (tmp_path / "one" / sub / csv).read_text()
        pa = (tmp_path / "sharded" / sub / csv).read_text()
        assert fa == pa, csv


def test_cli_shard_blocks_csv_parity_r2(tmp_path, capsys):
    """`--shard blocks` (2-D device mesh) at R=2: CSV digit parity."""
    import jax
    from tpuwave.cli import theta as cli_theta
    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device backend")
    case = driven_case(**{"Log Every": "1", "T": "0.04"})
    path = _write(tmp_path, case)
    assert _cli(cli_theta.main, path, tmp_path, "one") == 0
    assert cli_theta.main([str(path), "--results-root",
                           str(tmp_path / "blocks"), "--mesh-root",
                           str(tmp_path / "mesh"),
                           "--shard", "blocks"]) == 0
    out = capsys.readouterr().out
    assert "Sharding: blocks over" in out
    sub = "theta-case/run-R2-N8x8-dt0_01-T0_04-theta0_5"
    for csv in ("probe.csv", "energy.csv", "iterations.csv"):
        fa = (tmp_path / "one" / sub / csv).read_text()
        pa = (tmp_path / "blocks" / sub / csv).read_text()
        assert fa == pa, csv
