"""2-process jax.distributed dryrun of the multi-host wiring.

Runs scripts/jobs/multihost_dryrun.sh: two local CPU processes form a
jax.distributed cluster (the stand-in for two pod hosts; the reference's
analogue is local `mpirun -np 2`, README.md:123-124) and drive the
Newmark CLI with --distributed and per-device VTU pieces. The script
asserts every .pvtu record references piece files from BOTH processes —
process 0 only writes its local shards' pieces plus the record
(tpuwave/models/runner.py local_pieces restriction), so the presence of
process 1's piece files proves the cross-process write path executed.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_distributed_dryrun(tmp_path):
    script = REPO / "scripts" / "jobs" / "multihost_dryrun.sh"
    proc = subprocess.run(["bash", str(script), str(tmp_path / "out")],
                          capture_output=True, text=True, timeout=280,
                          cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "OK:" in proc.stdout
    assert "referencing 2 pieces" in proc.stdout
    # rank-0 semantics: only process 0 printed the run banner
    log0 = (tmp_path / "out" / "proc0.log").read_text()
    log1 = (tmp_path / "out" / "proc1.log").read_text()
    assert "Simulation completed" in log0
    assert "Simulation completed" not in log1
    assert "2 process(es)" in log0
