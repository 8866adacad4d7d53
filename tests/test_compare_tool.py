"""Tests for scripts/compare_with_reference.py classification logic.

The comparison tool is parity evidence (RESULTS.md quotes its summary
lines), so its row matching and blowup/noise-floor classification are
pinned here.
"""

import importlib.util
import math
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "compare_with_reference", REPO / "scripts" / "compare_with_reference.py")
cmp_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cmp_mod)


def test_key_matches_across_schemas():
    ref_row = {"method": "theta-conv-params", "N_el_x": "40", "r": "1",
               "dt": "0.01", "T": "1", "theta": "0.500000", "beta": "N/A"}
    our_row = dict(ref_row)
    assert cmp_mod.key_of(ref_row) == cmp_mod.key_of(our_row)


def test_metrics_skips_na_and_blank():
    m = cmp_mod.metrics_of({"rel_L2_error_final": "1e-3",
                            "rel_H1_error_final": "N/A",
                            "energy_ratio": ""})
    assert m == {"rel_L2_error_final": 1e-3}


def test_blowup_classification():
    is_blowup = cmp_mod.is_blowup
    # stable rows
    assert not is_blowup({"rel_L2_error_final": 1e-3,
                          "rel_H1_error_final": 1e-2})
    assert not is_blowup({"energy_ratio": 1.0})
    # marginal-but-stable H1 (the (40,1,dt=1e-3) FE straddle stays compared)
    assert not is_blowup({"rel_L2_error_final": 0.28,
                          "rel_H1_error_final": 12.1})
    # magnitude blowup / non-finite
    assert is_blowup({"rel_L2_error_final": 1e38})
    assert is_blowup({"rel_L2_error_final": math.inf})
    assert is_blowup({"rel_L2_error_final": math.nan})
    # slow energy blowup
    assert is_blowup({"energy_ratio": 11.0})
    # left the solution in L2
    assert is_blowup({"rel_L2_error_final": 12.0})
    # deep into blowup in H1 while L2 still O(1)
    assert is_blowup({"rel_L2_error_final": 3.95,
                      "rel_H1_error_final": 698.0})


def test_end_to_end_summary(tmp_path):
    hdr = "method,N_el_x,r,dt,T,theta,beta,rel_L2_error_final,rel_H1_error_final\n"
    ref = tmp_path / "ref.csv"
    ours = tmp_path / "ours.csv"
    rows = [
        # exact row
        ("theta-conv-params,10,1,0.01,1,0.5,N/A,1.5e-3,2.5e-2",
         "theta-conv-params,10,1,0.01,1,0.5,N/A,1.5e-3,2.5e-2"),
        # within 1e-3
        ("theta-conv-params,20,1,0.01,1,0.5,N/A,1.0e-3,2.0e-2",
         "theta-conv-params,20,1,0.01,1,0.5,N/A,1.0002e-3,2.0e-2"),
        # matching blowup (H1 rule on ours, magnitude on ref)
        ("theta-conv-params,40,1,0.01,1,0.0,N/A,1.2e5,3.0e7",
         "theta-conv-params,40,1,0.01,1,0.0,N/A,3.9,6.9e2"),
        # genuine mismatch
        ("theta-conv-params,80,1,0.01,1,0.5,N/A,1.0e-2,1.0e-1",
         "theta-conv-params,80,1,0.01,1,0.5,N/A,2.0e-2,1.0e-1"),
    ]
    ref.write_text(hdr + "\n".join(r for r, _ in rows) + "\n")
    ours.write_text(hdr + "\n".join(o for _, o in rows) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "compare_with_reference.py"),
         str(ours), str(ref)], capture_output=True, text=True)
    assert proc.returncode == 2  # one mismatch
    summary = proc.stdout.strip().splitlines()[-1]
    assert "4 common rows: 1 exact, 1 within 1e-3, 1 matching blowups, " \
           "1 mismatches" in summary
