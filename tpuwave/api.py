"""One-call convenience API.

    import tpuwave
    result = tpuwave.solve_problem("parameters/standing-mode-wsol.json",
                                   family="newmark")

wraps params -> discretisation -> solver -> run driver, the same pipeline
as the CLI entry points.
"""

from __future__ import annotations

from typing import Optional

from tpuwave.models.discretization import Discretization
from tpuwave.models.general import make_discretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.runner import RunConfig, RunResult, run_solver
from tpuwave.models.theta import ThetaSolver
from tpuwave.utils.params import Params, load_params

__all__ = ["solve", "build_solver"]


def build_solver(params: Params, family: str = "theta", **solver_kwargs):
    """Discretise and construct a stepper ('theta' or 'newmark')."""
    disc = make_discretization(params)
    if family == "theta":
        return ThetaSolver(disc, **solver_kwargs)
    if family == "newmark":
        return NewmarkSolver(disc, **solver_kwargs)
    raise ValueError(f"Unknown solver family {family!r}")


def solve(parameters, family: str = "theta", *, problem_name: Optional[str] = None,
          overrides=None, config: Optional[RunConfig] = None,
          **solver_kwargs) -> RunResult:
    """Load parameters (path or dict), run the full simulation, return the
    RunResult (final state, errors, timings, output folder)."""
    params = load_params(parameters, overrides=overrides)
    solver = build_solver(params, family, **solver_kwargs)
    if problem_name is None:
        from pathlib import Path
        stem = (Path(params.source_path).stem if params.source_path
                else "case")
        problem_name = f"{family}-{stem}"
    return run_solver(solver, problem_name, config or RunConfig(quiet=True))
