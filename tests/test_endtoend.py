"""End-to-end CLI runs: P2 elements, .prm input, variable wave speed."""

import json
from pathlib import Path

import numpy as np
import pytest

from tpuwave.cli import newmark as cli_newmark
from tpuwave.cli import theta as cli_theta

from tests.test_schemes import standing_mode


def write_case(tmp_path, name="case.json", **over):
    case = standing_mode(**over)
    path = tmp_path / name
    path.write_text(json.dumps(case))
    return path


def run_cli(main, path, tmp_path, extra=()):
    return main([str(path), "--results-root", str(tmp_path / "results"),
                 "--mesh-root", str(tmp_path / "mesh"), "--quiet", *extra])


def test_cli_theta_p2(tmp_path):
    path = write_case(tmp_path, Nel="8", R="2", T="0.05", Dt="0.01",
                      **{"Log Every": "5", "Save Solution": "false"})
    assert run_cli(cli_theta.main, path, tmp_path) == 0
    run_dir = tmp_path / "results" / "theta-case" / \
        "run-R2-N8x8-dt0_01-T0_05-theta0_5"
    err = (run_dir / "error.csv").read_text().splitlines()
    # P2 at Nel=8: rel L2 well below 1% already
    assert float(err[1].split(",")[4]) < 1e-2


def test_cli_newmark_prm(tmp_path):
    prm = tmp_path / "case.prm"
    prm.write_text("""
set Nel = 8
set T = 0.03
set Dt = 0.01
set Save Solution = false
set Log Every = 0
subsection C
  set Function expression = 1.0
  set Variable names = x, y, t
end
subsection F
  set Function expression = 0.0
  set Variable names = x, y, t
end
subsection U0
  set Function expression = sin(pi*x)*sin(pi*y)
  set Variable names = x, y
end
subsection V0
  set Function expression = 0.0
  set Variable names = x, y
end
subsection G
  set Function expression = 0.0
  set Variable names = x, y, t
end
subsection DGDT
  set Function expression = 0.0
  set Variable names = x, y, t
end
""")
    assert run_cli(cli_newmark.main, prm, tmp_path) == 0
    run_dir = tmp_path / "results" / "newmark-case" / \
        "run-R1-N8x8-dt0_01-T0_03-gamma0_5-beta0_25"
    assert run_dir.exists()


@pytest.mark.parametrize("r", [1, 2])
def test_variable_wave_speed_stable(tmp_path, r):
    """c(x, y) varying in space: both element paths (P1 scaled / P2 full)
    run stably with bounded energy."""
    from tpuwave.models.discretization import Discretization
    from tpuwave.models.theta import ThetaSolver
    from tpuwave.utils.params import load_params

    case = standing_mode(Nel="12", R=str(r), T="0.2", Dt="0.01")
    case["C"] = {"Function expression": "1.0 + 0.5*x*y",
                 "Variable names": "x, y, t"}
    del case["Solution"]
    p = load_params(case)
    d = Discretization(p)
    s = ThetaSolver(d)
    st = s.initial_state()
    e0 = float(d.energy(st.u, st.v))
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st, info = s.step(st, t)
    eT = float(d.energy(st.u, st.v))
    assert np.isfinite(eT)
    assert eT == pytest.approx(e0, rel=1e-3)  # CN conserves for variable c too


def test_cli_divergence_exit_code(tmp_path):
    path = write_case(tmp_path, Nel="32", Beta="0.0", T="50", Dt="0.5",
                      **{"Log Every": "0", "Save Solution": "false"})
    assert run_cli(cli_newmark.main, path, tmp_path) == 2
