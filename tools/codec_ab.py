"""Shuffle-codec A/B (VERDICT r3 #5): lz4 (default) vs zstd on the scaled
extraction job, interleaved runs at one parallelism level.

    python tools/codec_ab.py [cores] [reps]

Reports wall, task core-seconds, and shuffled MB per codec. Decision rule:
zstd wins only if it cuts shuffle bytes AND does not raise task CPU enough
to erase the gain — on a host-shared box, bytes are the scaling currency
(DRAM-bus sharing is the N→4N residual), so a byte cut at flat CPU is worth
taking even when wall is within noise.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_bench import parse_eventlog  # noqa: E402


def run_once(codec: str, cores: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"codec_{codec}_")
    evl = tempfile.mkdtemp(prefix=f"evl_{codec}_")
    env = dict(os.environ)
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "64"
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evl,
            "spark.io.compression.codec": codec,
        }
    )
    pin = ["taskset", "-c", f"0-{cores - 1}"] if shutil.which("taskset") else []
    try:
        proc = subprocess.run(
            pin
            + [
                sys.executable,
                os.path.join(REPO, "jobs", "spans_extract.py"),
                "--sf-dir", "/root/testdata/sf0.1",
                "--out", out,
                "--run-id", f"codec-{codec}",
                "--master", f"local[{cores}]",
                "--multiplier", "16", "--inflate", "32", "--warmup",
            ],
            capture_output=True, text=True, timeout=1800, cwd=REPO, env=env,
        )
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(last)
        r.update(parse_eventlog(evl))
        r["ambient_load"] = round(os.getloadavg()[0], 2)
        return r
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(evl, ignore_errors=True)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for i in range(reps):
        for codec in ("lz4", "zstd"):
            r = run_once(codec, cores)
            print(
                json.dumps(
                    {
                        "codec": codec,
                        "rep": i,
                        "sec": r["sec"],
                        "docs_per_sec": r["docs_per_sec"],
                        "task_run_core_s": r["task_run_core_s"],
                        "task_cpu_core_s": r["task_cpu_core_s"],
                        "shuffle_write_mb": r["shuffle_write_mb"],
                        "shuffle_read_mb": r["shuffle_read_mb"],
                        "ambient_load": r["ambient_load"],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
