"""Parameter system: schema, defaults, validation, JSON + PRM, presets."""

import json

import pytest

from tpuwave.utils.params import ParamError, load_params

MINIMAL_FUNCS = {
    name: {"Function constants": "", "Function expression": "0.0",
           "Variable names": "x, y, t"}
    for name in ("C", "F", "G", "DGDT")
}
MINIMAL_FUNCS.update({
    name: {"Function constants": "", "Function expression": "0.0",
           "Variable names": "x, y"}
    for name in ("U0", "V0")
})


def minimal(**extra):
    d = dict(MINIMAL_FUNCS)
    d["C"] = {"Function constants": "", "Function expression": "1.0",
              "Variable names": "x, y, t"}
    d.update(extra)
    return d


def test_defaults_match_reference():
    p = load_params(minimal())
    assert p.nel == (40, 40)
    assert p.geometry == ((0.0, 0.0), (1.0, 1.0))
    assert p.r == 1
    assert p.t_final == 1.0
    assert p.theta == 0.5
    assert p.beta == 0.25
    assert p.gamma == 0.5
    assert p.dt == 0.01
    assert p.save_solution is True
    assert p.enable_logging is True
    assert p.log_every == 10
    assert p.print_every == 10
    assert p.solution is None


def test_nel_forms():
    assert load_params(minimal(Nel="80")).nel == (80, 80)
    assert load_params(minimal(Nel="180, 60")).nel == (180, 60)
    with pytest.raises(ParamError):
        load_params(minimal(Nel="1, 2, 3"))
    with pytest.raises(ParamError):
        load_params(minimal(Nel="0"))


def test_geometry_parsing():
    p = load_params(minimal(Geometry="[-1.0, 1.0] x [0.5, 2.5]"))
    assert p.geometry == ((-1.0, 0.5), (1.0, 2.5))
    with pytest.raises(ParamError):
        load_params(minimal(Geometry="0,1 x 0,1"))


def test_range_checks():
    with pytest.raises(ParamError):
        load_params(minimal(Theta="1.5"))
    with pytest.raises(ParamError):
        load_params(minimal(Beta="-0.1"))
    with pytest.raises(ParamError):
        load_params(minimal(R="3"))


def test_missing_function_raises():
    d = minimal()
    del d["F"]
    with pytest.raises(ParamError, match="F"):
        load_params(d)


def test_empty_expression_raises_except_solution():
    d = minimal()
    d["G"] = {"Function expression": ""}
    with pytest.raises(ParamError, match="G"):
        load_params(d)
    d = minimal(Solution={"Function expression": ""})
    assert load_params(d).solution is None


def test_enable_logging_false_means_log_every_zero():
    p = load_params(minimal(**{"Enable Logging": "false"}))
    assert p.log_every == 10
    assert p.effective_log_every == 0


def test_overrides():
    p = load_params(minimal(), overrides={"Nel": "7", "Dt": "0.125"})
    assert p.nel == (7, 7) and p.dt == 0.125


def test_prm_format(tmp_path):
    prm = tmp_path / "case.prm"
    prm.write_text("""
# comment
set Nel = 12
set T = 2.0
subsection C
  set Function expression = 1.0
  set Variable names = x, y, t
end
subsection F
  set Function expression = 0.0
  set Variable names = x, y, t
end
subsection U0
  set Function expression = sin(pi*x)
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
    p = load_params(prm)
    assert p.nel == (12, 12)
    assert p.t_final == 2.0
    assert p.u0.expression == "sin(pi*x)"


def test_all_presets_load(parameters_dir):
    presets = sorted(parameters_dir.glob("*.json"))
    assert len(presets) == 12
    wsol = 0
    for f in presets:
        p = load_params(f)
        assert p.source_path == str(f)
        if p.has_exact_solution:
            wsol += 1
    assert wsol == 4  # standing/two-modes/five-modes + dumping-wave


def test_presets_match_generator(parameters_dir):
    """parameters/*.json must stay in sync with scripts/generate_presets.py."""
    import importlib.util
    import json as _json
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "generate_presets",
        Path(parameters_dir).parent / "scripts" / "generate_presets.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, data in mod.PRESETS.items():
        on_disk = _json.loads((parameters_dir / f"{name}.json").read_text())
        assert on_disk == data, f"preset {name} out of sync with generator"
