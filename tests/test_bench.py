"""Contract test for the repo-root ``bench.py`` driver entry point.

The round driver runs ``python bench.py`` and parses exactly ONE JSON line
of the form {"metric", "value", "unit", "vs_baseline"} from stdout; a
regression here silently loses the round's recorded benchmark. Exercised
on the CPU fallback path (TPUWAVE_BENCH_CPU_FALLBACK short-circuits the
tunnel watchdog), which shares the measurement/report code with the TPU
path — only device count/size differ.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_one_json_line():
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               TPUWAVE_BENCH_CPU_FALLBACK="1")
    env.pop("XLA_FLAGS", None)  # single-device run, no virtual mesh
    proc = subprocess.run([sys.executable, str(REPO / "bench.py")],
                          capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # stdout must be exactly one parseable JSON object line (stderr is
    # free-form commentary)
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "DoF*steps/s"
    assert rec["value"] > 0
    # even the CPU fallback beats the reference's 32-rank CPU baseline
    assert rec["vs_baseline"] > 1.0
