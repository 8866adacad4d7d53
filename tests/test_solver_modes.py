"""Product-surface implicit-solve strategies (``--solver 3term|2term|cheby``).

Round-4 contract: the repo's best implicit solvers — the displacement-form
2-term MG recurrence (models/fast_engine_2term.py) and the dot-product-free
restarted-Chebyshev solve (models/fast_engine.py::_solve_cheby) — are
reachable from the CLI with the full problem class (driven g, forcing,
varcoef c for 2term), with the documented accuracy classes.
"""

import csv
import json

import jax.numpy as jnp
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.fast_engine import make_fast_solver
from tpuwave.models.fast_engine_2term import (Fast2TermNewmarkSolver,
                                              Fast2TermThetaSolver)
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.params import load_params

from tests.test_fast_engine import DRIVEN
from tests.test_schemes import standing_mode


def driven_case(**over):
    case = standing_mode(**DRIVEN)
    case.pop("Solution")
    case.update(over)
    return case


def _run(solver, p):
    st = solver.initial_state()
    t, info = 0.0, None
    while t < p.t_final - 1e-12:
        t += p.dt
        st, info = solver.step(st, t)
    return st, info, t


CASES = [
    ("base", {}),
    ("be", {"Theta": "1.0"}),
    ("unforced", {"F": {"Function expression": "0.0"}}),
    ("homog", {"G": {"Function expression": "0.0",
                     "Variable names": "x, y, t"},
               "DGDT": {"Function expression": "0.0",
                        "Variable names": "x, y, t"}}),
    ("varcoef", {"C": {"Function expression": "1.0 + 0.5*x",
                       "Variable names": "x, y, t"}}),
]


@pytest.mark.parametrize("fam", ["theta", "newmark"])
@pytest.mark.parametrize("name,over", CASES)
def test_2term_matches_parity_tolerance_class(fam, name, over):
    """Driven + forced + varcoef: the 2-term displacement engine matches
    the parity trajectory at the solve-tolerance class (u ~1e-8 over the
    run at the 1e-6 CG reduction; v reconstructed exactly — the Newmark
    boundary strips carry the derived-BC recurrence)."""
    case = driven_case(Beta="0.25", **over)
    p = load_params(case)
    d = Discretization(p)
    ref = ThetaSolver(d) if fam == "theta" else NewmarkSolver(d)
    s2 = make_fast_solver(d, fam, solver="2term", precond="mg")
    assert isinstance(s2, (Fast2TermThetaSolver, Fast2TermNewmarkSolver))
    st_r, _, _ = _run(ref, p)
    st_2, _, tf = _run(s2, p)
    nu = float(jnp.linalg.norm(st_r.u))
    assert float(jnp.linalg.norm(st_r.u - st_2.u)) < 1e-6 * nu, name
    v2 = s2.state_velocity(st_2, tf)
    nv = float(jnp.linalg.norm(st_r.v)) + 1e-30
    assert float(jnp.linalg.norm(st_r.v - v2)) < 1e-4 * nv, name


def test_2term_scan_path_matches_per_step():
    """The runner's whole-loop scan (ScanMixin over the lax.cond
    first/recurrence step) reproduces per-step calls exactly."""
    p = load_params(driven_case())
    s2 = make_fast_solver(load_params(driven_case()), "theta",
                          solver="2term", precond="mg")
    st_steps, _, _ = _run(s2, p)
    times = []
    t = 0.0
    while t < p.t_final - 1e-12:
        t += p.dt
        times.append(t)
    st_scan, infos = s2.run_steps(s2.initial_state(), times)
    assert float(jnp.linalg.norm(st_steps.u - st_scan.u)) == 0.0
    assert infos["iterations_1"].shape == (len(times),)


def test_2term_rejections():
    """tdep c and Newmark beta=0 are cleanly rejected (both degrees)."""
    td = driven_case(**{"Time Dependent C": "true",
                        "C": {"Function expression":
                              "sqrt(1 + 0.5*sin(2*t))",
                              "Variable names": "x, y, t"}})
    with pytest.raises(ValueError, match="time-static"):
        make_fast_solver(load_params(td), "theta", solver="2term")
    with pytest.raises(ValueError, match="Beta > 0"):
        make_fast_solver(load_params(driven_case(Beta="0.0")), "newmark",
                         solver="2term")
    with pytest.raises(ValueError, match="time-static"):
        make_fast_solver(load_params(dict(td, R="2")), "theta",
                         solver="2term")
    with pytest.raises(ValueError, match="Beta > 0"):
        make_fast_solver(load_params(driven_case(Beta="0.0", R="2")),
                         "newmark", solver="2term")


@pytest.mark.parametrize("fam", ["theta", "newmark"])
def test_cheby_solver_matches_parity_tolerance_class(fam):
    """--solver cheby (restarted Chebyshev with analytic symbol bounds)
    honours the same ReductionControl stopping contract: trajectories
    agree with parity CG at the tolerance class; iteration counts differ
    (documented perf mode)."""
    p = load_params(driven_case(Beta="0.25"))
    d = Discretization(p)
    ref = ThetaSolver(d) if fam == "theta" else NewmarkSolver(d)
    sc = make_fast_solver(d, fam, solver="cheby")
    st_r, _, _ = _run(ref, p)
    st_c, info_c, _ = _run(sc, p)
    nu = float(jnp.linalg.norm(st_r.u))
    assert float(jnp.linalg.norm(st_r.u - st_c.u)) < 1e-6 * nu
    assert int(info_c["iterations_1"]) > 0


def test_cheby_rejects_varcoef():
    for r in ("1", "2"):
        with pytest.raises(ValueError, match="constant wave speed"):
            make_fast_solver(load_params(driven_case(
                R=r, C={"Function expression": "1.0 + 0.5*x",
                        "Variable names": "x, y, t"})), "theta",
                solver="cheby")


# ---------------------------------------------------------------------------
# R = 2 (round-5 contract: the solver modes are degree-generic, like the
# reference's one solve path for both degrees, WaveNewmark.cpp:177-262)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fam", ["theta", "newmark"])
@pytest.mark.parametrize("name,over", [
    ("base", {}),
    ("homog", CASES[3][1]),
    ("varcoef", CASES[4][1]),
])
def test_2term_r2_matches_parity_tolerance_class(fam, name, over):
    """--solver 2term at R=2 (models/fast_engine_p2_2term.py): driven +
    forced + varcoef quadratic runs match the parity trajectory at the
    solve-tolerance class, with the exact v reconstruction (Newmark
    boundary strips over the three P2 boundary plane families)."""
    from tpuwave.models.fast_engine_p2_2term import (
        FastP22TermNewmarkSolver, FastP22TermThetaSolver)
    case = driven_case(Beta="0.25", R="2", Nel="8", **over)
    p = load_params(case)
    d = Discretization(p)
    ref = ThetaSolver(d) if fam == "theta" else NewmarkSolver(d)
    s2 = make_fast_solver(d, fam, solver="2term", precond="mg")
    assert isinstance(s2, (FastP22TermThetaSolver,
                           FastP22TermNewmarkSolver))
    st_r, _, _ = _run(ref, p)
    st_2, _, tf = _run(s2, p)
    u2 = s2.to_flat(st_2.u)
    nu = float(jnp.linalg.norm(st_r.u))
    assert float(jnp.linalg.norm(st_r.u - u2)) < 1e-6 * nu, name
    v2 = s2.to_flat(s2.state_velocity(st_2, tf))
    nv = float(jnp.linalg.norm(st_r.v)) + 1e-30
    assert float(jnp.linalg.norm(st_r.v - v2)) < 1e-4 * nv, name


@pytest.mark.parametrize("fam", ["theta", "newmark"])
def test_cheby_solver_r2_matches_parity_tolerance_class(fam):
    """--solver cheby at R=2: restarted Chebyshev on the constrained
    canvas system with 4x4 block-symbol eigenvalue bounds — same
    ReductionControl stopping contract, trajectory at tolerance class."""
    p = load_params(driven_case(Beta="0.25", R="2", Nel="8"))
    d = Discretization(p)
    ref = ThetaSolver(d) if fam == "theta" else NewmarkSolver(d)
    sc = make_fast_solver(d, fam, solver="cheby")
    st_r, _, _ = _run(ref, p)
    st_c, info_c, _ = _run(sc, p)
    nu = float(jnp.linalg.norm(st_r.u))
    assert float(jnp.linalg.norm(st_r.u - sc.to_flat(st_c.u))) < 1e-6 * nu
    assert int(info_c["iterations_1"]) > 0


def test_2term_r2_scan_path_matches_per_step():
    """ScanMixin over the lax.cond first/recurrence step at R=2."""
    p = load_params(driven_case(R="2", Nel="8"))
    s2 = make_fast_solver(p, "theta", solver="2term", precond="mg")
    st_steps, _, _ = _run(s2, p)
    times = []
    t = 0.0
    while t < p.t_final - 1e-12:
        t += p.dt
        times.append(t)
    st_scan, infos = s2.run_steps(s2.initial_state(), times)
    assert float(jnp.linalg.norm(st_steps.u - st_scan.u)) == 0.0
    assert infos["iterations_1"].shape == (len(times),)


def test_2term_r2_sharded_matches_single_device():
    """--shard rows composes with --solver 2term at R=2: the canvas
    plane stack row-shards over the 8-device virtual mesh and reproduces
    the single-device trajectory + reconstructed velocity."""
    import jax
    from tpuwave.parallel.sharding import device_mesh, grid_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = load_params(driven_case(R="2", Nel="9,7", T="0.03"))
    sh = grid_sharding(device_mesh(8))
    s1 = make_fast_solver(p, "newmark", solver="2term", precond="mg")
    s8 = make_fast_solver(p, "newmark", solver="2term", precond="mg",
                          sharding=sh)
    st1, _, tf = _run(s1, p)
    st8, _, _ = _run(s8, p)
    assert len(st8.u.sharding.device_set) == 8
    u1, u8 = s1.to_flat(st1.u), s8.to_flat(st8.u)
    nu = float(jnp.linalg.norm(u1))
    assert float(jnp.linalg.norm(u1 - u8)) < 1e-12 * nu
    v1 = s1.to_flat(s1.state_velocity(st1, tf))
    v8 = s8.to_flat(s8.state_velocity(st8, tf))
    assert float(jnp.linalg.norm(v1 - v8)) \
        < 1e-10 * float(jnp.linalg.norm(v1))


def _cli_energy(tmp_path, root, path, extra):
    from tpuwave.cli import theta as cli_theta
    rc = cli_theta.main([str(path), "--results-root",
                         str(tmp_path / root), "--mesh-root",
                         str(tmp_path / "mesh"), "--quiet", *extra])
    assert rc == 0
    sub = "theta-case/run-R1-N16x16-dt0_01-T0_05-theta0_5"
    f = tmp_path / root / sub / "energy.csv"
    return [float(r["energy"]) for r in csv.DictReader(open(f))]


def test_cli_solver_modes_energy_agrees(tmp_path):
    """`--solver 2term` / `--solver cheby` through the CLI produce the
    standard run folder with energy rows matching `--solver 3term` at the
    CSVs' %.6g formatting on a driven + forced case (the reconstructed-v
    energy is exact at log points)."""
    case = driven_case(**{"Log Every": "1", "T": "0.05"})
    path = tmp_path / "case.json"
    path.write_text(json.dumps(case))
    e3 = _cli_energy(tmp_path, "a", path, ())
    e2 = _cli_energy(tmp_path, "b", path,
                     ("--solver", "2term", "--precond", "mg"))
    ec = _cli_energy(tmp_path, "c", path, ("--solver", "cheby"))
    assert len(e3) == 5
    for i, (a, b, c) in enumerate(zip(e3, e2, ec)):
        assert abs(a - b) < 5e-6 * abs(a), ("2term", i, a, b)
        assert abs(a - c) < 5e-6 * abs(a), ("cheby", i, a, c)


def test_cli_solver_requires_fast_engine(tmp_path):
    """--solver 2term on a fast-ineligible problem is a hard error with
    a hint (the parity engine runs the 3term form only)."""
    from tpuwave.cli import theta as cli_theta
    case = driven_case(Nel="1")
    path = tmp_path / "n1.json"
    path.write_text(json.dumps(case))
    rc = cli_theta.main([str(path), "--results-root", str(tmp_path / "o"),
                        "--mesh-root", str(tmp_path / "mesh"), "--quiet",
                         "--solver", "2term"])
    assert rc == 1


def test_2term_checkpoint_roundtrip(tmp_path):
    """--checkpoint-every/--resume through the 2-term engine: the state
    pair + boundary strips + step counter round-trip the npz and the
    resumed run continues the recurrence exactly."""
    from tpuwave.cli import newmark as cli_newmark
    case = driven_case(**{"T": "0.06", "Log Every": "2", "Beta": "0.25"})
    path = tmp_path / "case.json"
    path.write_text(json.dumps(case))
    args = ["--mesh-root", str(tmp_path / "mesh"), "--quiet",
            "--solver", "2term", "--precond", "mg"]
    assert cli_newmark.main([str(path), "--results-root",
                             str(tmp_path / "full"), *args]) == 0
    case_half = dict(case, T="0.03")
    p_half = tmp_path / "case_half.json"
    p_half.write_text(json.dumps(case_half))
    assert cli_newmark.main([str(p_half), "--results-root",
                             str(tmp_path / "res"), *args,
                             "--checkpoint-every", "1"]) == 0
    import shutil
    half_dir = tmp_path / "res" / \
        "newmark-case_half/run-R1-N16x16-dt0_01-T0_03-gamma0_5-beta0_25"
    full_dir = tmp_path / "res" / \
        "newmark-case/run-R1-N16x16-dt0_01-T0_06-gamma0_5-beta0_25"
    full_dir.mkdir(parents=True)
    for f in half_dir.glob("checkpoint_*.npz"):
        shutil.copy(f, full_dir / f.name)
    assert cli_newmark.main([str(path), "--results-root",
                             str(tmp_path / "res"), *args,
                             "--resume"]) == 0
    got = (full_dir / "probe.csv").read_text()
    want = (tmp_path / "full" /
            "newmark-case/run-R1-N16x16-dt0_01-T0_06-gamma0_5-beta0_25"
            "/probe.csv").read_text()
    assert got.splitlines()[-1] == want.splitlines()[-1]


def test_2term_sharded_matches_single_device():
    """The 2-term displacement engine partitions like the 3-term one
    (--shard rows composes with --solver 2term): driven + forced + mg on
    the 8-device virtual mesh reproduces the single-device trajectory
    and the reconstructed velocity."""
    import jax
    from tpuwave.parallel.sharding import device_mesh, grid_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    p = load_params(driven_case(**{"Nel": "16,15", "T": "0.03"}))
    sh = grid_sharding(device_mesh(8))
    s1 = make_fast_solver(p, "theta", solver="2term", precond="mg")
    s8 = make_fast_solver(p, "theta", solver="2term", precond="mg",
                          sharding=sh)
    st1, _, tf = _run(s1, p)
    st8, _, _ = _run(s8, p)
    assert len(st8.u.sharding.device_set) == 8
    nu = float(jnp.linalg.norm(st1.u))
    assert float(jnp.linalg.norm(st1.u - st8.u)) < 1e-13 * nu
    v1 = s1.state_velocity(st1, tf)
    v8 = s8.state_velocity(st8, tf)
    assert float(jnp.linalg.norm(v1 - v8)) \
        < 1e-11 * float(jnp.linalg.norm(v1))


def test_cli_solver_modes_r2_energy_agrees(tmp_path):
    """`--solver 2term|cheby` at R=2 through the CLI (round-5 done
    criterion: `tpuwave-newmark <r2-preset> --solver 2term` accepted):
    energy rows match `--solver 3term` at the CSVs' formatting."""
    import csv as _csv
    from tpuwave.cli import newmark as cli_newmark
    case = driven_case(**{"Log Every": "1", "T": "0.05", "R": "2",
                          "Nel": "8", "Beta": "0.25"})
    path = tmp_path / "case.json"
    path.write_text(json.dumps(case))

    def energy(root, extra):
        rc = cli_newmark.main([str(path), "--results-root",
                               str(tmp_path / root), "--mesh-root",
                               str(tmp_path / "mesh"), "--quiet", *extra])
        assert rc == 0
        sub = "newmark-case/run-R2-N8x8-dt0_01-T0_05-gamma0_5-beta0_25"
        f = tmp_path / root / sub / "energy.csv"
        return [float(r["energy"]) for r in _csv.DictReader(open(f))]

    e3 = energy("a", ())
    e2 = energy("b", ("--solver", "2term", "--precond", "mg"))
    ec = energy("c", ("--solver", "cheby"))
    assert len(e3) == 5
    for i, (a, b, c) in enumerate(zip(e3, e2, ec)):
        assert abs(a - b) < 5e-6 * abs(a), ("2term", i, a, b)
        assert abs(a - c) < 5e-6 * abs(a), ("cheby", i, a, c)
