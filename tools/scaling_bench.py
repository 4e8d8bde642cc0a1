"""Two-parallelism scaling benchmark → BENCH/BASELINE.md.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox; per BASELINE.md we run the
same spans_extract job on the same input at local[8] and local[32] in fresh
JVMs and report throughput at both plus eff = (T_32 / T_8) / 4.

Usage: python tools/scaling_bench.py [sf_dir] [--runs N]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(sf_dir: str, cores: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"scale_{cores}_")
    try:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "spans_extract.py"),
                "--sf-dir", sf_dir,
                "--out", out,
                "--run-id", f"scale-{cores}",
                "--master", f"local[{cores}]",
            ],
            capture_output=True, text=True, timeout=1800, cwd=REPO,
        )
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(last)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = 2
    results: dict[int, dict] = {}
    for cores in (8, 32):
        best = None
        for _ in range(runs):
            r = run_once(sf_dir, cores)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cores] = best
        print(f"local[{cores}]: {best}")

    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (t32 / t8) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH baseline — spans_extract throughput & scaling

Input: synthesized interleaved-docs table from `{sf_dir}` (docs={results[8]['docs']},
spans={results[8]['spans']}), job = `jobs/spans_extract.py` (full pipeline incl.
result/cache/progress writes), best of {runs} runs per config, fresh JVM each.

| parallelism | wall-clock s | docs/sec | scaling efficiency |
|---|---|---|---|
| local[8] (N) | {results[8]['sec']} | {t8} | — |
| local[32] (4N) | {results[32]['sec']} | {t32} | {eff:.3f} |

Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4. Target ≥ 0.8
(BASELINE.json north rule, N vs 4N executors stand-in per BASELINE.md).

Spark conf: AQE on (coalesce+skewJoin), shuffle.partitions = cores,
Arrow batch 2048, UTC, dynamic partition overwrite.
"""
        )
    print(f"eff = {eff:.3f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
