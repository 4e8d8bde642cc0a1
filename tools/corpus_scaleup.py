"""Corpus scale-up probe with per-stage attribution → BENCH/QUIET_R5.md.

The 100×-question series (r3: ×16→×64 at 2.0× wall; r4: 1.37× after the
zstd codec cut): one more octave. Runs the flagship spans_extract job at
fixed local[32] over deterministically inflated corpora (multiplier ×
inflate, synth.py) and parses each run's event log into PER-STAGE task
time + shuffle bytes, so any super-linear term shows up attributed to its
stage instead of hiding in the wall number.

Usage: python tools/corpus_scaleup.py [sf_dir] [mults...]
  default sf_dir /root/testdata/sf0.1, mults 16 64 256
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INFLATE = int(os.environ.get("SPARK_GRAFT_SCALE_INFLATE", "32"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def parse_stages(evl_dir: str) -> list[dict]:
    """Per-stage (task-time core-s, cpu core-s, shuffle r/w MB, n_tasks),
    labeled from the stage's callsite name, sorted by task time desc."""
    import glob

    import pyarrow as pa

    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    for path in glob.glob(f"{evl_dir}/**/events*", recursive=True) or glob.glob(
        f"{evl_dir}/*"
    ):
        if os.path.isdir(path) or path.endswith(".crc"):
            continue
        if path.endswith(".zstd"):
            data = pa.CompressedInputStream(pa.OSFile(path), "zstd").read()
        else:
            data = open(path, "rb").read()
        for line in data.decode("utf-8", "replace").splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev.get("Stage Info") or {}
                names[si.get("Stage ID", -1)] = si.get("Stage Name", "?")
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID", -1)
                m = ev.get("Task Metrics") or {}
                s = stages.setdefault(
                    sid,
                    {"run_s": 0.0, "cpu_s": 0.0, "sh_w_mb": 0.0, "sh_r_mb": 0.0,
                     "n_tasks": 0},
                )
                s["run_s"] += m.get("Executor Run Time", 0) / 1000
                s["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                sw = m.get("Shuffle Write Metrics") or {}
                s["sh_w_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                s["sh_r_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                s["n_tasks"] += 1
    out = []
    for sid, s in stages.items():
        out.append(
            {
                "stage": sid,
                "name": (names.get(sid, "?") or "?").split("\n")[0][:60],
                **{k: round(v, 1) if isinstance(v, float) else v for k, v in s.items()},
            }
        )
    return sorted(out, key=lambda s: -s["run_s"])


def run_once(sf_dir: str, mult: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"scaleup_{mult}_")
    evl = tempfile.mkdtemp(prefix=f"scaleup_evl_{mult}_")
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evl}
    )
    # The single local JVM stands in for CORES executors; a real cluster
    # scales total heap with the fleet, so the probe's heap grows with the
    # corpus (×256 ≈ 12.8 GB of spans needs headroom for cache + 32
    # concurrent task buffers; 16 g measured OOM before the r5 partition
    # autoscale, and cache-vs-execution pressure remains real above it).
    env["SPARK_GRAFT_DRIVER_MEM"] = (
        "48g" if mult >= 128 else "24g" if mult >= 64 else "16g"
    )
    try:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "spans_extract.py"),
                "--sf-dir", sf_dir,
                "--out", out,
                "--run-id", f"scaleup-{mult}",
                "--master", f"local[{CORES}]",
                "--multiplier", str(mult),
                "--inflate", str(INFLATE),
                "--warmup",
            ],
            capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            return {"mult": mult, "error": proc.stderr[-2000:]}
        r = json.loads(lines[-1])
        stages = parse_stages(evl)
        return {
            "mult": mult,
            "docs": r["docs"],
            "sec": r["sec"],
            "docs_per_sec": r["docs_per_sec"],
            "per_doc_ms": round(1000.0 * r["sec"] / max(1, r["docs"]), 4),
            "ambient_load": round(os.getloadavg()[0], 2),
            "total_task_run_s": round(sum(s["run_s"] for s in stages)),
            "total_shuffle_w_mb": round(sum(s["sh_w_mb"] for s in stages), 1),
            "top_stages": stages[:8],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(evl, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].isdigit() else "/root/testdata/sf0.1"
    mults = [int(a) for a in args if a.isdigit()] or [16, 64, 256]
    results = []
    for m in mults:
        r = run_once(sf_dir, m)
        print(json.dumps(r), flush=True)
        results.append(r)
    ok = [r for r in results if "error" not in r]
    if len(ok) >= 2:
        for a, b in zip(ok, ok[1:]):
            ratio = b["sec"] / a["sec"]
            data = b["docs"] / a["docs"]
            print(
                f"# x{a['mult']}->x{b['mult']}: {data:.0f}x data -> "
                f"{ratio:.2f}x wall; per-doc {a['per_doc_ms']} -> "
                f"{b['per_doc_ms']} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
