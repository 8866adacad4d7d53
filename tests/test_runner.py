"""Run driver + IO: folder naming, CSV schemas, VTU output, env overrides."""

import os
from pathlib import Path

import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.runner import RunConfig, run_solver, time_steps
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.naming import clean_double, run_folder_name
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode


def test_clean_double():
    # reference WaveEquationBase.cpp:433-452 semantics
    assert clean_double(0.5) == "0_5"
    assert clean_double(0.01) == "0_01"
    assert clean_double(1.0) == "1"
    assert clean_double(10.0) == "10"
    assert clean_double(0.015625) == "0_015625"
    assert clean_double(0.00350) == "0_0035"
    assert clean_double(60.0) == "60"
    assert clean_double(0.0) == "0"
    assert clean_double(1.0, 2) == "1"
    assert clean_double(-1.0, 2) == "-1"


def test_run_folder_name():
    f = run_folder_name("results", "theta-standing-mode-wsol", 1, (80, 80),
                        0.01, 60.0, "-theta0_5")
    assert str(f) == "results/theta-standing-mode-wsol/run-R1-N80x80-dt0_01-T60-theta0_5"


def test_time_steps_accumulation():
    # float accumulation semantics identical to the C++ `while (time < T)`
    # loop: 0.1 accumulated 10x is 0.9999999999999999 < 1.0, so an 11th
    # step runs — matching the reference exactly.
    ts = time_steps(1.0, 0.1)
    assert len(ts) == 11
    t = 0.0
    for want in ts:
        t += 0.1
        assert want == t
    # exact dyadic dt gives the nominal count
    assert len(time_steps(1.0, 0.125)) == 8
    assert len(time_steps(0.05, 0.01)) == 5


def run_tiny(tmp_path, scheme="theta", **over):
    over.setdefault("Nel", "8")
    over.setdefault("T", "0.05")
    over.setdefault("Dt", "0.01")
    over.setdefault("Log Every", "2")
    over.setdefault("Save Solution", "true")
    p = load_params(standing_mode(**over))
    d = Discretization(p)
    s = ThetaSolver(d) if scheme == "theta" else NewmarkSolver(d)
    cfg = RunConfig(results_root=str(tmp_path / "results"),
                    mesh_root=str(tmp_path / "mesh"), quiet=True)
    return run_solver(s, f"{scheme}-test-case", cfg), p


def test_run_outputs(tmp_path):
    result, p = run_tiny(tmp_path)
    folder = result.output_folder
    assert folder.name == "run-R1-N8x8-dt0_01-T0_05-theta0_5"
    assert result.timestep_number == 5
    assert not result.diverged

    for name in ("energy.csv", "error.csv", "probe.csv", "iterations.csv"):
        f = folder / name
        assert f.exists(), name
    energy = (folder / "energy.csv").read_text().splitlines()
    assert energy[0] == "timestep,time,energy"
    assert len(energy) == 1 + 2  # steps 2 and 4
    assert energy[1].startswith("2,0.02,")
    err = (folder / "error.csv").read_text().splitlines()
    assert err[0] == "timestep,time,L2_error,H1_error,rel_L2_error,rel_H1_error"
    probe = (folder / "probe.csv").read_text().splitlines()
    assert probe[0] == "timestep,time,u_probe"

    conv = folder.parent / "convergence.csv"
    assert conv.exists()
    lines = conv.read_text().splitlines()
    assert lines[0].startswith("h,N_el_x,N_el_y,r,dt,T,method,theta,beta,gamma")
    fields = lines[1].split(",")
    assert fields[1] == "8" and fields[3] == "1"
    assert fields[7] == "0.500000" and fields[8] == "N/A"  # theta run

    # VTU output: steps 0..5, pvtu + piece each
    for k in range(6):
        assert (folder / f"solution_{k:04d}.pvtu").exists()
        assert (folder / f"solution_{k:04d}.0.vtu").exists()
    vtu = (folder / "solution_0005.0.vtu").read_bytes()
    assert b"u_exact" in vtu and b"partitioning" in vtu

    # mesh snapshot
    assert (tmp_path / "mesh").exists()
    vtks = list((tmp_path / "mesh").glob("rectangle-simplices-*.vtk"))
    assert len(vtks) == 1


def test_run_newmark_convergence_row(tmp_path):
    result, p = run_tiny(tmp_path, scheme="newmark")
    conv = result.output_folder.parent / "convergence.csv"
    fields = conv.read_text().splitlines()[1].split(",")
    assert fields[7] == "N/A"
    assert fields[8] == "0.250000" and fields[9] == "0.500000"


def test_logging_disabled_no_csvs(tmp_path):
    result, p = run_tiny(tmp_path, **{"Log Every": "0", "Save Solution": "false"})
    folder = result.output_folder
    for name in ("energy.csv", "error.csv", "probe.csv", "iterations.csv"):
        assert not (folder / name).exists(), name
    assert not list(folder.glob("*.vtu"))
    # convergence.csv is written regardless (exact solution present)
    assert (folder.parent / "convergence.csv").exists()


def test_env_save_solution_override(tmp_path, monkeypatch):
    monkeypatch.setenv("NMPDE_SAVE_SOLUTION", "0")
    result, p = run_tiny(tmp_path)
    assert not list(result.output_folder.glob("*.vtu"))


def test_param_file_copied(tmp_path, parameters_dir, monkeypatch):
    src = parameters_dir / "standing-mode-wsol.json"
    p = load_params(src, overrides={"Nel": "8", "T": "0.02", "Dt": "0.01",
                                    "Save Solution": "false", "Log Every": "0"})
    d = Discretization(p)
    s = ThetaSolver(d)
    cfg = RunConfig(results_root=str(tmp_path / "results"),
                    mesh_root=str(tmp_path / "mesh"), quiet=True)
    result = run_solver(s, "theta-standing-mode-wsol", cfg)
    assert (result.output_folder / "parameters.json").exists()


def test_divergence_early_break(tmp_path):
    # explicit Newmark far above CFL blows up and the runner stops early
    result, p = run_tiny(tmp_path, scheme="newmark", Beta="0.0",
                         Dt="0.5", T="50.0", Nel="32",
                         **{"Save Solution": "false", "Log Every": "0"})
    assert result.diverged
    assert result.timestep_number < 100


def test_probe_value_matches_fe_interpolation(tmp_path):
    p = load_params(standing_mode(Nel="9", T="0.02", Dt="0.01",
                                  **{"Save Solution": "false"}))
    d = Discretization(p)
    s = ThetaSolver(d)
    st = s.initial_state()
    # probe at centre of [0,1]^2 with odd grid: interpolated value of u0
    got = float(d.probe(st.u))
    # P1 interpolation error at h=1/9 is ~3e-2
    assert got == pytest.approx(np.sin(np.pi * 0.5) ** 2, abs=0.05)


def test_runlogs_disabled_writes_nothing(tmp_path):
    """enabled=False (non-primary host, rank-0 file semantics): no files."""
    from tpuwave.utils.csvlog import RunLogs

    logs = RunLogs(tmp_path / "run", tmp_path / "conv.csv", enabled=False)
    logs.log_energy(1, 0.1, 2.5)
    logs.log_error(1, 0.1, 1e-3, 1e-2, 1e-3, 1e-2)
    logs.log_probe(1, 0.1, 0.5)
    logs.log_iterations(1, 0.1, 3, 4)
    assert not (tmp_path / "run").exists()
    assert not (tmp_path / "conv.csv").exists()


def test_run_steps_diag_cache_keys_on_diag_fn(tmp_path):
    """Two different diag_fns must each produce their own diagnostics
    (the scan jit is memoized per diag_fn identity)."""
    import jax.numpy as jnp
    import numpy as np
    from pathlib import Path
    from tpuwave.models.discretization import Discretization
    from tpuwave.models.theta import ThetaSolver
    from tpuwave.utils.params import load_params

    base = Path(__file__).resolve().parent.parent / "parameters" / \
        "standing-mode-wsol.json"
    params = load_params(base, overrides={
        "Nel": "8", "R": "1", "Dt": "0.01", "T": "0.05",
        "Save Solution": False, "Enable Logging": False, "Log Every": 0})
    s = ThetaSolver(Discretization(params))
    st = s.initial_state()
    times = [0.01, 0.02]

    def diag_a(state, t):
        return {"val": jnp.sum(state.u)}

    def diag_b(state, t):
        return {"val": jnp.zeros(())}

    _, info_a = s.run_steps_diag(st, times, diag_a)
    _, info_b = s.run_steps_diag(st, times, diag_b)
    assert float(np.asarray(info_a["val"])[0]) != 0.0
    assert float(np.asarray(info_b["val"]).sum()) == 0.0


def test_scan_path_arbitrary_log_every_matches_per_step(tmp_path):
    """log_every > 1 (the preset-default cadence) runs as chunked scans
    with host diagnostics at chunk ends — CSV bytes identical to the
    per-step loop (forced via phase_timing)."""
    import json
    from tests.test_schemes import standing_mode
    from tpuwave.cli import newmark as cli_newmark

    case = standing_mode(Nel="12", T="0.1", Dt="0.01",
                         **{"Log Every": "3", "Print Every": "2",
                            "Save Solution": "false"})
    path = tmp_path / "case.json"
    path.write_text(json.dumps(case))

    def run(root, extra=()):
        assert cli_newmark.main(
            [str(path), "--results-root", str(tmp_path / root),
             "--mesh-root", str(tmp_path / "mesh"), "--quiet",
             *extra]) == 0
        sub = "newmark-case/run-R1-N12x12-dt0_01-T0_1-gamma0_5-beta0_25"
        return tmp_path / root / sub

    scan_dir = run("scan")
    step_dir = run("step", ("--phase-timing",))
    for csv in ("energy.csv", "error.csv", "probe.csv", "iterations.csv"):
        assert (scan_dir / csv).read_text() == \
            (step_dir / csv).read_text(), csv
