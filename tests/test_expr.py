"""Expression compiler tests: grammar, precedence, and golden evaluation of
every preset expression against independent numpy evaluation."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from tpuwave.utils.expr import (Expression, ExprError, parse_constants_with_pi,
                                parse_value_with_pi)


def ev(expr, constants=None, **env):
    e = Expression(expr, constants, list(env.keys()))
    return float(np.asarray(e(**env)))


def test_basic_arithmetic():
    assert ev("1 + 2*3") == 7.0
    assert ev("(1 + 2)*3") == 9.0
    assert ev("8/4/2") == 1.0
    assert ev("2 - 3 - 4") == -5.0


def test_power_right_assoc_and_unary_minus():
    assert ev("2^3") == 8.0
    assert ev("2^3^2") == 512.0           # right-assoc: 2^(3^2)
    assert ev("-2^2") == -4.0             # ^ binds tighter than unary minus
    assert ev("(-2)^2") == 4.0
    assert ev("-x^2", x=3.0) == -9.0
    assert ev("2^-1") == 0.5


def test_functions():
    assert ev("sin(pi/2)") == pytest.approx(1.0)
    assert ev("sqrt(2)") == pytest.approx(math.sqrt(2))
    assert ev("cosh(0)") == 1.0
    assert ev("tanh(100)") == pytest.approx(1.0)
    assert ev("exp(1)") == pytest.approx(math.e)
    assert ev("min(3, 2, 5)") == 2.0
    assert ev("max(3, 2, 5)") == 5.0
    assert ev("abs(-3)") == 3.0
    assert ev("atan2(1, 1)") == pytest.approx(math.pi / 4)


def test_if_and_logic():
    assert ev("if(1 < 2, 10, 20)") == 10.0
    assert ev("if(1 > 2, 10, 20)") == 20.0
    assert ev("if(x<0.1 && 0<=y && y<=1, 5, 0)", x=0.05, y=0.5) == 5.0
    assert ev("if(x<0.1 && 0<=y && y<=1, 5, 0)", x=0.5, y=0.5) == 0.0
    assert ev("if(1<2 || 2<1, 1, 0)") == 1.0
    assert ev("if(!(1<2), 1, 0)") == 0.0


def test_comparison_arithmetic_promotion():
    # comparisons used arithmetically promote to 0/1
    assert ev("(1<2) + (3<2)") == 1.0


def test_constants():
    assert ev("k*t", {"k": 4 * math.pi}, t=0.5) == pytest.approx(2 * math.pi)
    assert parse_value_with_pi("pi") == math.pi
    assert parse_value_with_pi("PI") == math.pi
    assert parse_value_with_pi("4.0*pi") == 4 * math.pi
    assert parse_value_with_pi(" 2.5 ") == 2.5
    consts = parse_constants_with_pi("TT=0.5, XX=0.5, k=4.0*pi")
    assert consts == {"TT": 0.5, "XX": 0.5, "k": 4 * math.pi}
    assert parse_constants_with_pi("") == {}
    assert parse_constants_with_pi("garbage, a=1") == {"a": 1.0}


def test_constant_folding():
    e = Expression("0.0", variable_names=["x", "y", "t"])
    assert e.constant_value == 0.0 and e.is_zero
    e = Expression("2*pi", variable_names=["x", "y", "t"])
    assert e.constant_value == pytest.approx(2 * math.pi)
    e = Expression("sin(x)", variable_names=["x", "y", "t"])
    assert e.constant_value is None
    assert not e.time_dependent
    e = Expression("sin(t)", variable_names=["x", "y", "t"])
    assert e.time_dependent


def test_errors():
    with pytest.raises(ExprError):
        Expression("sin(x", variable_names=["x"])
    with pytest.raises(ExprError):
        Expression("x + unknown_name", variable_names=["x"])
    with pytest.raises(ExprError):
        Expression("nosuchfn(x)", variable_names=["x"])
    with pytest.raises(ExprError):
        Expression("x @ y", variable_names=["x", "y"])


def test_evaluate_broadcasts():
    e = Expression("sin(k*t)", {"k": 2.0}, ["x", "y", "t"])
    x = np.linspace(0, 1, 5)
    out = np.asarray(e.evaluate(x, x, 0.25))
    assert out.shape == (5,)
    assert np.allclose(out, math.sin(0.5))


def _numpy_env(consts):
    env = {"pi": math.pi, "sin": np.sin, "cos": np.cos, "exp": np.exp,
           "sqrt": np.sqrt, "tanh": np.tanh, "cosh": np.cosh,
           "abs": np.abs, "tan": np.tan}
    env.update(consts)
    return env


def _numpy_eval(expr, consts, x, y, t):
    """Independent evaluation: rewrite muparser syntax to Python and eval."""
    py = expr.replace("^", "**").replace("&&", ")&(").replace("||", ")|(")
    # if(c, a, b) -> np.where(c, a, b); wrap condition for & precedence
    py = py.replace("if(", "WHERE((")
    # close the extra paren right before the first comma of each WHERE —
    # simpler: use a tiny recursive descent via eval with helper
    def WHERE(c, a, b):
        return np.where(c, a, b)
    env = _numpy_env(consts)
    env.update({"x": x, "y": y, "t": t, "WHERE": WHERE})
    # patch: our WHERE(( ...needs a closing paren at first top-level comma
    out = []
    i = 0
    while i < len(py):
        if py.startswith("WHERE((", i):
            out.append("WHERE((")
            i += len("WHERE((")
            depth = 0
            while i < len(py):
                ch = py[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    out.append("),")
                    i += 1
                    break
                out.append(ch)
                i += 1
        else:
            out.append(py[i])
            i += 1
    return eval("".join(out), {"np": np}, env)  # noqa: S307 (test-only)


def test_all_preset_expressions_golden(parameters_dir):
    """Every function expression in every preset matches numpy evaluation."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 3, size=64)
    y = rng.uniform(-1, 3, size=64)
    for pfile in sorted(parameters_dir.glob("*.json")):
        data = json.loads(Path(pfile).read_text())
        for key in ("C", "F", "U0", "V0", "G", "DGDT", "Solution"):
            if key not in data:
                continue
            sub = data[key]
            consts = parse_constants_with_pi(sub["Function constants"])
            e = Expression(sub["Function expression"], consts,
                           sub["Variable names"])
            for t in (0.0, 0.3, 1.7):
                got = np.asarray(e.evaluate(x, y, t))
                want = np.broadcast_to(
                    _numpy_eval(sub["Function expression"], consts, x, y, t),
                    x.shape)
                np.testing.assert_allclose(
                    got, want, rtol=1e-12, atol=1e-13,
                    err_msg=f"{pfile.name}:{key} at t={t}")


def test_random_expression_trees_match_numpy():
    """Property test: random ASTs printed to muparser syntax and re-parsed
    must match direct numpy evaluation of the same tree."""
    rng = np.random.default_rng(42)
    x = rng.uniform(0.1, 2.0, size=16)
    y = rng.uniform(0.1, 2.0, size=16)

    def gen(depth):
        r = rng.random()
        if depth <= 0 or r < 0.25:
            choice = rng.integers(0, 3)
            if choice == 0:
                v = float(f"{rng.uniform(0.1, 3.0):.4f}")
                return (f"{v}", lambda e, v=v: v)
            return ("x", lambda e: x) if choice == 1 else ("y", lambda e: y)
        if r < 0.55:
            op = ["+", "-", "*"][rng.integers(0, 3)]
            (sa, fa), (sb, fb) = gen(depth - 1), gen(depth - 1)
            fn = {"+": np.add, "-": np.subtract, "*": np.multiply}[op]
            return (f"({sa} {op} {sb})",
                    lambda e, fa=fa, fb=fb, fn=fn: fn(fa(e), fb(e)))
        if r < 0.7:
            (sa, fa) = gen(depth - 1)
            return (f"-{sa}" if sa[0] != "-" else f"-({sa})",
                    lambda e, fa=fa: -fa(e))
        if r < 0.85:
            name = ["sin", "cos", "tanh", "exp", "sqrt", "abs"][rng.integers(0, 6)]
            fn = {"sin": np.sin, "cos": np.cos, "tanh": np.tanh,
                  "exp": np.exp, "sqrt": np.sqrt, "abs": np.abs}[name]
            (sa, fa) = gen(depth - 1)
            if name in ("exp",):  # keep magnitudes sane
                return (f"{name}(tanh({sa}))",
                        lambda e, fa=fa: np.exp(np.tanh(fa(e))))
            if name == "sqrt":
                return (f"sqrt(abs({sa}))",
                        lambda e, fa=fa: np.sqrt(np.abs(fa(e))))
            return (f"{name}({sa})", lambda e, fa=fa: fn(fa(e)))
        (sa, fa), (sb, fb), (sc, fc) = gen(depth - 1), gen(depth - 1), gen(depth - 1)
        return (f"if({sa} < {sb}, {sc}, {sb})",
                lambda e, fa=fa, fb=fb, fc=fc: np.where(
                    fa(e) < fb(e), fc(e) + 0 * x, fb(e) + 0 * x))

    for _ in range(40):
        expr_str, ref_fn = gen(4)
        e = Expression(expr_str, None, ["x", "y"])
        got = np.asarray(e.evaluate(x, y))
        want = np.broadcast_to(np.asarray(ref_fn(None), dtype=float), x.shape)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12,
                                   err_msg=expr_str)
