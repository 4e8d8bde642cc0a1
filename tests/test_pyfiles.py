"""The --py-files ship path: the engine must run with the package imported
from the zip artifact, not from a repo checkout (north rule: "ships via
spark-submit --py-files ... on a multi-executor cluster").

The job script is copied to a neutral tmp dir before submission, so its
own ``sys.path.insert(dirname(dirname(__file__)))`` points at nothing —
every ``text_extract_api_spark`` import must resolve through the zip.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build_zip

    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
    import zipfile

    names = zipfile.ZipFile(a).namelist()
    assert "text_extract_api_spark/pipeline.py" in names
    assert "conf/strategies.yaml" in names
    assert not any("__pycache__" in n for n in names)


def test_spans_extract_runs_from_pyfiles_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "engine.zip"))
    job = tmp_path / "spans_extract.py"
    shutil.copyfile(os.path.join(REPO, "jobs", "spans_extract.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide the package
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            str(job),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(out_dir),
            "--run-id",
            "zipship",
            "--waves",
            "1",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 500
    assert summary["spans"] > 0
