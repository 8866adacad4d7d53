"""Public one-call API."""

import pytest

import tpuwave
from tpuwave.models.runner import RunConfig

from tests.test_schemes import standing_mode


def test_solve_dict(tmp_path):
    case = standing_mode(Nel="8", T="0.03", Dt="0.01",
                         **{"Save Solution": "false", "Log Every": "0"})
    cfg = RunConfig(results_root=str(tmp_path / "results"),
                    mesh_root=str(tmp_path / "mesh"), quiet=True)
    result = tpuwave.solve_problem(case, family="newmark", config=cfg)
    assert result.timestep_number == 3
    assert result.rel_l2 is not None and result.rel_l2 < 0.3


def test_solve_unknown_family():
    with pytest.raises(ValueError, match="family"):
        tpuwave.solve_problem(standing_mode(), family="leapquack")


def test_lazy_exports():
    assert callable(tpuwave.load_params)
    with pytest.raises(AttributeError):
        tpuwave.nope
