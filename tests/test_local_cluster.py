"""True multi-executor smoke: the engine must run with SEPARATE executor
JVMs, not just in-process local[N] threads.

r5 regression guard: the first `local-cluster[2,4,…]` run of the flagship
job died in every Arrow stage with ``ModuleNotFoundError`` — executor
Python workers cannot see the driver's checkout, which plain local[N]
silently papers over. `session._ship_package` now auto-ships the package
as a py-files zip whenever the master has remote executors; this test
pins both the fix and result parity across execution modes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flagship_job_runs_on_separate_executor_jvms(tmp_path):
    out = str(tmp_path / "lc_out")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "spans_extract.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out,
            "--run-id", "lc-test",
            "--master", "local-cluster[2,2,2048]",
            "--waves", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-3000:]
    summary = json.loads(lines[-1])
    # identical verdicts to every local[N] run of the same corpus — the
    # distribution mode must not change a single row
    assert summary["docs"] == 500
    assert summary["spans"] == 1588
    assert summary["quarantined"] == 25
    assert "ModuleNotFoundError" not in proc.stderr
