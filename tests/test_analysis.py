"""Tests for the analysis scripts' order-fit methodology.

The committed order tables (analysis/data/*-orders.csv) are produced by
analysis/convergence_analysis.py; pin that its floor-aware fits recover
known orders from synthetic data and ignore saturated/unstable rows.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "convergence_analysis", REPO / "analysis" / "convergence_analysis.py")
ca = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ca)


def synth(order_t=2.0, order_sl2=2.0, order_sh1=1.0, c_t=100.0, c_s=0.5):
    """Collapsed-bound error model err = c_t dt^q + c_s h^s over a sweep."""
    rows = []
    for nel in (10, 20, 40, 80):
        h = 1.0 / nel
        for dt in (1e-4, 2e-4, 5e-4, 1e-3, 2e-3, 5e-3, 1e-2):
            rows.append({
                "scheme": "cn", "r": 1, "N_el_x": nel, "h": h, "dt": dt,
                "rel_L2_error_final": c_t * dt ** order_t
                + c_s * h ** order_sl2,
                "rel_H1_error_final": c_t * dt ** order_t
                + c_s * h ** order_sh1,
            })
    return pd.DataFrame(rows)


def test_temporal_fit_recovers_order():
    t = ca.temporal_orders(synth(order_t=2.0))
    assert len(t) == 1
    # the floor-aware window keeps only temporally-dominated points, so
    # the fitted slope lands near the true order despite the h-floor
    assert t.temporal_order_L2.iloc[0] == pytest.approx(2.0, abs=0.25)


def test_spatial_fit_recovers_orders():
    s = ca.spatial_orders(synth(order_sl2=2.0, order_sh1=1.0))
    assert len(s) == 1
    assert s.spatial_order_L2.iloc[0] == pytest.approx(2.0, abs=0.25)
    assert s.spatial_order_H1.iloc[0] == pytest.approx(1.0, abs=0.25)


def test_saturated_sweep_produces_no_fit():
    # all points at the spatial floor (no dt dependence): nothing is 3x
    # above the floor, so no temporal order row is emitted instead of a
    # bogus slope-0 fit
    df = synth(c_t=0.0)
    df["rel_L2_error_final"] = 1e-3
    assert len(ca.temporal_orders(df)) == 0


def test_drop_unstable_matches_comparison_tool():
    df = pd.DataFrame([
        {"rel_L2_error_final": 0.1, "rel_H1_error_final": 0.5},   # stable
        {"rel_L2_error_final": 11.0, "rel_H1_error_final": 0.5},  # L2 blown
        {"rel_L2_error_final": 3.9, "rel_H1_error_final": 698.0},  # H1 blown
        {"rel_L2_error_final": 0.28, "rel_H1_error_final": 12.0},  # marginal
    ])
    kept = ca.drop_unstable(df)
    assert list(kept.index) == [0, 3]


def test_fit_slope_basic():
    x = np.array([1.0, 2.0, 4.0])
    assert ca.fit_slope(x, x ** 3) == pytest.approx(3.0)
    assert np.isnan(ca.fit_slope(x[:1], x[:1]))


def test_reference_notebooks_executed():
    """The committed executed copies of the reference's own notebooks
    (analysis/reference-notebooks/README.md) ran against tpuwave CSVs
    with zero errors and produced figures — the schema-compatibility
    proof for PARITY.md C13."""
    import nbformat
    base = Path(__file__).resolve().parent.parent / "analysis" / \
        "reference-notebooks"
    expected = {
        "convergence-analysis-executed.ipynb": 10,
        "dissipation-dispersion-analysis-executed.ipynb": 2,
        "scalability-analisys-executed.ipynb": 3,
    }
    for name, min_figures in expected.items():
        nb = nbformat.read(base / name, as_version=4)
        outputs = [o for c in nb.cells if c.cell_type == "code"
                   for o in c.get("outputs", [])]
        errors = [o for o in outputs if o.get("output_type") == "error"]
        assert not errors, f"{name}: {errors[0].get('ename')}"
        executed = [c for c in nb.cells
                    if c.cell_type == "code" and c.source.strip()]
        assert all(c.get("execution_count") for c in executed), \
            f"{name}: unexecuted code cells"
        figures = [o for o in outputs if "image/png" in o.get("data", {})]
        assert len(figures) >= min_figures, \
            f"{name}: only {len(figures)} figures"
