"""Checkpoint/resume + profiling utilities."""

import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.runner import RunConfig, run_solver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.checkpoint import load_latest, save_checkpoint
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode


def test_save_load_roundtrip(tmp_path):
    from collections import namedtuple
    S = namedtuple("S", ["u", "v"])
    st = S(u=np.arange(5.0), v=np.ones(5))
    save_checkpoint(tmp_path, 12, 0.12, st)
    save_checkpoint(tmp_path, 24, 0.24, st._replace(u=2 * st.u))
    ts, t, fields = load_latest(tmp_path)
    assert ts == 24 and t == 0.24
    np.testing.assert_allclose(fields["u"], 2 * np.arange(5.0))


def test_checkpoint_pruning(tmp_path):
    from collections import namedtuple
    S = namedtuple("S", ["u"])
    for k in range(1, 6):
        save_checkpoint(tmp_path, k, 0.1 * k, S(u=np.zeros(3)), keep=2)
    ckpts = sorted(tmp_path.glob("checkpoint_*.npz"))
    assert [c.name for c in ckpts] == ["checkpoint_000004.npz",
                                       "checkpoint_000005.npz"]


@pytest.mark.parametrize("scheme", ["theta", "newmark"])
def test_resume_reproduces_uninterrupted_run(tmp_path, scheme):
    over = {"Nel": "10", "T": "0.05", "Dt": "0.01",
            "Save Solution": "false", "Log Every": "0"}
    p = load_params(standing_mode(**over))

    def make():
        d = Discretization(p)
        s = ThetaSolver(d) if scheme == "theta" else NewmarkSolver(d)
        return s

    cfg = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                    write_mesh=False, checkpoint_every=2)
    full = run_solver(make(), f"{scheme}-ck", cfg)
    assert full.timestep_number == 5
    ckpts = sorted(full.output_folder.glob("checkpoint_*.npz"))
    assert [c.name for c in ckpts] == ["checkpoint_000002.npz",
                                       "checkpoint_000004.npz"]

    # resume: restarts from step 4 and replays only the final step
    cfg2 = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                     write_mesh=False, resume=True)
    resumed = run_solver(make(), f"{scheme}-ck", cfg2)
    assert resumed.timestep_number == 5
    np.testing.assert_allclose(np.asarray(resumed.state.u),
                               np.asarray(full.state.u), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed.state.v),
                               np.asarray(full.state.v), rtol=1e-12)


def test_phase_timer():
    import time
    from tpuwave.utils.profiling import PhaseTimer
    pt = PhaseTimer()
    with pt.phase("solve"):
        time.sleep(0.01)
    with pt.phase("solve"):
        pass
    with pt.phase("rhs"):
        pass
    assert pt.counts["solve"] == 2
    assert pt.totals["solve"] >= 0.01
    assert "solve" in pt.report()


def test_trace_noop():
    from tpuwave.utils.profiling import trace
    with trace(None):
        pass


def test_resume_truncates_post_checkpoint_log_rows(tmp_path):
    """Rows logged after the restored checkpoint must not be duplicated
    (crash-between-checkpoint-and-last-log scenario)."""
    over = {"Nel": "10", "T": "0.06", "Dt": "0.01",
            "Save Solution": "false", "Log Every": "1"}
    p = load_params(standing_mode(**over))

    cfg = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                    write_mesh=False, checkpoint_every=4)
    full = run_solver(ThetaSolver(Discretization(p)), "theta-trunc", cfg)
    energy = (full.output_folder / "energy.csv").read_text().splitlines()
    assert len(energy) == 1 + 6  # header + steps 1..6

    # resume: checkpoint is at step 4 but logs run to step 6 — the resumed
    # run must end with exactly one row per step, no duplicates
    cfg2 = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                     write_mesh=False, resume=True)
    run_solver(ThetaSolver(Discretization(p)), "theta-trunc", cfg2)
    energy = (full.output_folder / "energy.csv").read_text().splitlines()
    steps = [int(line.split(",")[0]) for line in energy[1:]]
    assert steps == [1, 2, 3, 4, 5, 6]


def test_resume_with_tdep_payload(tmp_path):
    """Time Dependent C: the carried K(t) payload round-trips through the
    checkpoint (saved as an array field; None-payload states skip it)."""
    over = {"Nel": "8", "T": "0.05", "Dt": "0.01",
            "Save Solution": "false", "Log Every": "0",
            "Time Dependent C": "true",
            "C": {"Function expression": "sqrt(1 + 0.5*sin(2*t))",
                  "Variable names": "x, y, t"}}
    p = load_params(standing_mode(**over))

    def make():
        return ThetaSolver(Discretization(p))

    cfg = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                    write_mesh=False, checkpoint_every=2)
    full = run_solver(make(), "theta-tdep-ck", cfg)
    cfg2 = RunConfig(results_root=str(tmp_path / "results"), quiet=True,
                     write_mesh=False, resume=True)
    resumed = run_solver(make(), "theta-tdep-ck", cfg2)
    np.testing.assert_allclose(np.asarray(resumed.state.u),
                               np.asarray(full.state.u), rtol=1e-12)
    assert resumed.state.k_payload is not None
