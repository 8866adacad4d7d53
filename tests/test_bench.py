"""Contract test for the repo-root ``bench.py`` driver entry point.

The round driver runs ``python bench.py`` under a wall-clock timeout and
parses the LAST JSON line of the form {"metric", "value", "unit",
"vs_baseline"} from stdout; bench.py prints one line per measured path as
soon as it improves on the best so far, so a kill mid-run still leaves a
parseable result. A regression here silently loses the round's recorded
benchmark. Exercised on the CPU fallback path (TPUWAVE_BENCH_CPU_FALLBACK
short-circuits the tunnel watchdog), which shares the measurement/report
code with the TPU path — only device count/size differ.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_incremental_json_lines():
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               TPUWAVE_BENCH_CPU_FALLBACK="1")
    env.pop("XLA_FLAGS", None)  # single-device run, no virtual mesh
    proc = subprocess.run([sys.executable, str(REPO / "bench.py")],
                          capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # every stdout line must be a parseable JSON object (stderr is
    # free-form commentary); the driver takes the last one
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 1, proc.stdout
    recs = [json.loads(ln) for ln in lines]
    for rec in recs:
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
        assert rec["unit"] == "DoF*steps/s"
        assert rec["value"] > 0
    # later lines only ever improve on earlier ones
    values = [rec["value"] for rec in recs]
    assert values == sorted(values)
    # even the CPU fallback beats the reference's 32-rank CPU baseline
    assert recs[-1]["vs_baseline"] > 1.0
